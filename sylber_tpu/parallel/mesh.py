"""Device mesh + sharding rules (replaces the reference's Lightning DDP/NCCL,
`/root/reference/train.py:91-102`).

Strategy: a 2-D ``(dp, mp)`` mesh.
- ``dp``: data parallel — batches sharded over axis 0; XLA inserts the
  gradient ``psum`` automatically under jit (GSPMD), riding ICI.
- ``mp``: tensor parallel over the encoder — attention q/k/v projections and
  the FFN hidden dim are sharded column-wise, out projections row-wise, so
  each layer needs exactly one all-reduce per sublayer (Megatron layout).

The model is small (HuBERT-base 9L), so DP is the production default; TP is
provided for completeness and validated on a simulated CPU mesh by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over param path, PartitionSpec). First match wins; default replicate.
TP_RULES = (
    (r"attention/(q_proj|k_proj|v_proj)/kernel$", P(None, "mp")),
    (r"attention/(q_proj|k_proj|v_proj)/bias$", P("mp")),
    (r"attention/out_proj/kernel$", P("mp", None)),
    (r"intermediate_dense/kernel$", P(None, "mp")),
    (r"intermediate_dense/bias$", P("mp")),
    (r"output_dense/kernel$", P("mp", None)),
)

# FSDP (ZeRO-3-style) leaves smaller than this stay replicated: sharding a
# tiny bias saves nothing and costs an all-gather dispatch per use.
FSDP_MIN_SIZE = 2 ** 16

# Conv kernels are excluded from FSDP: XLA's SPMD partitioner CHECK-fails
# (convolution_handler.cc "new_input_batch_size % new_output_batch_size")
# when a grouped conv's kernel is sharded along the same axis as the input
# batch, and conv weights are <5% of HuBERT's params anyway — the memory
# win lives in the encoder matmuls.
FSDP_EXCLUDE = re.compile(r"feature_extractor/|pos_conv_embed/")


def _fsdp_extend(spec: P, shape, dp: int,
                 min_size: int = FSDP_MIN_SIZE) -> P:
    """Add a ``dp`` axis to ``spec`` on the largest free, divisible dim.

    This is the GSPMD expression of ZeRO-3 / FSDP: the parameter (and its
    optimizer moments, which share the spec) lives sharded over the data
    axis; XLA inserts the all-gather before each use and turns the gradient
    psum into a reduce-scatter. Per-device param+optimizer memory drops by
    ~dp x for the sharded leaves. Leaves whose dims are all occupied by mp
    or not divisible by dp stay as-is.
    """
    if int(np.prod(shape)) < min_size:
        return spec
    dims = list(spec) + [None] * (len(shape) - len(spec))
    best, best_size = None, 0
    for i, d in enumerate(shape):
        if dims[i] is None and d % dp == 0 and d > best_size:
            best, best_size = i, int(d)
    if best is None:
        return spec
    dims[best] = "dp"
    return P(*dims)


def maybe_distributed_init(dist_cfg: Optional[dict] = None) -> bool:
    """Multi-host initialization (SURVEY.md §2.6: "jax.distributed init over
    ICI/DCN", replacing the reference's Lightning DDP spawn,
    `/root/reference/train.py:91-102`).

    Enabled by a ``distributed:`` config block or env ``SYLBER_TPU_DIST=1``.
    On TPU pods launched with the standard runtime env, a bare
    ``jax.distributed.initialize()`` auto-discovers the coordinator and
    process topology; explicit values (single-host multi-process CPU/GPU
    rigs) come from config keys / env vars ``coordinator_address``
    (``SYLBER_TPU_COORDINATOR``), ``num_processes``
    (``SYLBER_TPU_NUM_PROCESSES``), ``process_id``
    (``SYLBER_TPU_PROCESS_ID``). After this, ``jax.devices()`` spans every
    host, so the same ``make_mesh`` call lays dp/mp over ICI within a slice
    and DCN across slices (axis order: dp outermost = DCN-friendly, mp
    innermost = ICI).

    Returns True if jax.distributed was initialized by this call.
    """
    import os

    cfg = dict(dist_cfg or {})
    # a present distributed: block enables it unless it says enabled: false
    enabled = (bool(cfg.get("enabled", True)) if dist_cfg is not None
               else False)
    enabled = enabled or os.environ.get("SYLBER_TPU_DIST") == "1" \
        or "SYLBER_TPU_COORDINATOR" in os.environ
    if not enabled:
        return False
    kwargs = {}
    addr = cfg.get("coordinator_address") \
        or os.environ.get("SYLBER_TPU_COORDINATOR")
    if addr:
        kwargs["coordinator_address"] = addr
    for key, env in (("num_processes", "SYLBER_TPU_NUM_PROCESSES"),
                     ("process_id", "SYLBER_TPU_PROCESS_ID")):
        val = cfg.get(key, os.environ.get(env))
        if val is not None:
            kwargs[key] = int(val)
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except RuntimeError as e:
        if "already" in str(e).lower():  # double-init is a no-op
            return False
        raise


def make_mesh(
    dp: Optional[int] = None, mp: int = 1, devices=None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % mp == 0, (n, mp)
        dp = n // mp
    assert dp * mp <= n, f"mesh {dp}x{mp} exceeds {n} devices"
    arr = np.array(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, axis_names=("dp", "mp"))


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def hubert_param_specs(params, use_tp: bool = True, fsdp_dp: int = 0,
                       fsdp_min_size: int = FSDP_MIN_SIZE):
    """PartitionSpec tree for a HubertModel param pytree.

    ``fsdp_dp > 1`` additionally shards every large leaf over the ``dp``
    axis (ZeRO-3/FSDP; see ``_fsdp_extend``). The same function works on an
    optax state pytree: moment/accumulator subtrees carry the param path as
    a suffix, so the suffix-anchored TP_RULES match them too, and scalar
    leaves (counts) fall through to replicate.
    """

    def spec_for(path, leaf):
        spec = P()
        if use_tp:
            s = _path_str(path)
            for pat, tp_spec in TP_RULES:
                if re.search(pat, s):
                    spec = tp_spec
                    break
        shape = getattr(leaf, "shape", ())
        if fsdp_dp and fsdp_dp > 1 and len(shape) \
                and not FSDP_EXCLUDE.search(_path_str(path)):
            spec = _fsdp_extend(spec, shape, fsdp_dp, min_size=fsdp_min_size)
        return spec

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, use_tp: bool = True,
                 fsdp: bool = False, fsdp_min_size: int = FSDP_MIN_SIZE):
    specs = hubert_param_specs(
        params, use_tp=use_tp,
        fsdp_dp=int(mesh.shape["dp"]) if fsdp else 0,
        fsdp_min_size=fsdp_min_size)
    return jax.tree.map(lambda x, s: put_global(x, mesh, s), params, specs)


def put_global(x, mesh: Mesh, spec: P):
    """Place a host array as a global array sharded by ``spec``.

    Single-process: plain ``device_put``. Multi-process (after
    ``jax.distributed.initialize``): every process passes the SAME host
    value (the data pipeline is seeded identically on every host — see
    train/loop.py) and this assembles the global array from each process's
    addressable shards, which is the only placement path that works when
    the sharding spans non-addressable devices. PRNG keys (extended dtypes)
    are unwrapped/rewrapped around the placement since numpy can't slice
    them.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and jnp_issubdtype_extended(x.dtype):
        data = put_global(np.asarray(jax.random.key_data(x)), mesh, spec)
        return jax.random.wrap_key_data(data, impl=jax.random.key_impl(x))
    x = np.asarray(x)
    idx_map = sharding.addressable_devices_indices_map(x.shape)
    arrs = [jax.device_put(x[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(x.shape, sharding, arrs)


def jnp_issubdtype_extended(dtype) -> bool:
    import jax.numpy as jnp

    return jnp.issubdtype(dtype, jax.dtypes.extended)


def shard_batch(batch, mesh: Mesh):
    """Shard array leaves over the dp axis (axis 0); multi-host-safe."""

    def put(x):
        if x is None:
            return None
        spec = P("dp", *([None] * (x.ndim - 1)))
        return put_global(x, mesh, spec)

    return jax.tree.map(put, batch, is_leaf=lambda x: x is None)


def replicated(x, mesh: Mesh):
    return put_global(x, mesh, P())


def fetch_global(tree):
    """Host copy of possibly-sharded global arrays (multi-host-safe).

    Single-process: ``device_get``. Multi-process: allgather across
    processes so every host gets the assembled global value (needed for
    TP-sharded params at checkpoint hand-off; for replicated leaves this
    degenerates to a fetch). All processes must call this together.
    """
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)


def fetch_replicated(tree):
    """Host copy of (assumed replicated / process-0-complete) leaves.

    ``jax.device_get`` refuses arrays spanning non-addressable devices
    (every jitted output on a multi-host mesh); the first addressable
    shard of a replicated array IS the global value.
    """

    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return jax.device_get(x)

    return jax.tree.map(get, tree)
