"""Device-resident dataset: in-graph batch gather == host collate.

`data/device.py` pre-collates the corpus once and gathers batches on device
(see its docstring for the axon host-buffer-retention bug it sidesteps, and
the per-step H2D reduction to an index vector).
"""

import numpy as np

from sylber_tpu.data.dataset import SyntheticSpeechDataset
from sylber_tpu.data.device import device_stream, precollate
from sylber_tpu.parallel.mesh import make_mesh


def test_gathered_batch_matches_host_collate():
    ds = SyntheticSpeechDataset(n_utts=12, max_len=32000, with_segments=True,
                                with_noise=True, seed=3)
    mesh = make_mesh(dp=1, mp=1, devices=None)
    data = precollate(ds)
    idx = np.array([7, 2, 9, 0])
    import jax.numpy as jnp

    got = {k: np.asarray(v[jnp.asarray(idx)]) for k, v in data.items()
           if v is not None}

    host = ds.collate([ds[int(i)] for i in idx])
    # host pads to batch max; device pads to corpus max — compare the
    # overlapping prefix and assert the device tail is zero/masked
    L = host["input_values"].shape[1]
    np.testing.assert_array_equal(got["input_values"][:, :L],
                                  host["input_values"])
    assert np.all(got["input_values"][:, L:] == 0)
    np.testing.assert_array_equal(got["attention_mask"][:, :L],
                                  host["attention_mask"])
    assert np.all(got["attention_mask"][:, L:] == 0)
    np.testing.assert_array_equal(got["segments"], host["segments"])
    np.testing.assert_array_equal(got["num_segments"], host["num_segments"])
    np.testing.assert_array_equal(got["noise"][:, :L], host["noise"])


def test_device_stream_epochs_cover_dataset():
    ds = SyntheticSpeechDataset(n_utts=8, max_len=16000, with_segments=True,
                                with_noise=False, seed=1)
    mesh = make_mesh(dp=2, mp=1)
    stream = device_stream(ds, batch_size=4, mesh=mesh, seed=0)
    # one epoch = 2 batches covering all 8 items exactly once
    b1 = next(stream)
    b2 = next(stream)
    assert b1["input_values"].shape[0] == 4
    assert b1.get("noise") is None  # with_noise=False: key absent or None
    # next epoch reshuffles but still yields full batches
    b3 = next(stream)
    assert b3["input_values"].shape == b1["input_values"].shape


def test_train_loop_device_resident_smoke(tmp_path):
    from sylber_tpu.train.loop import train

    m = {"encoding_layer": 1,
         "hubert": {"hidden_size": 32, "num_attention_heads": 4,
                    "intermediate_size": 64, "conv_dim": [16] * 7,
                    "num_conv_pos_embeddings": 16,
                    "num_conv_pos_embedding_groups": 4},
         "precision": "default", "lr": 1e-3, "warmup_steps": 2,
         "total_steps": 50, "min_factor": 1.0, "do_noise_augment": True}
    cfg = {"name": "devres", "seed": 0, "model": m,
           "data": {"synthetic": True, "n_utts": 16, "max_len": 16000,
                    "batch_size": 8, "device_resident": True},
           "max_steps": 8}
    state = train(cfg, out_dir=str(tmp_path), max_steps=8, log_every=4,
                  ckpt_every=8)
    assert int(state.step) == 8
