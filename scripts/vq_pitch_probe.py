"""Diagnose the trainable-VQ pitch collapse (VERDICT r4 item 1).

Stage-by-stage ridge probes of per-frame log-pitch decodability:
  (a) raw segment-averaged 144-d encoder features  -> pitch
  (b) unit-normed features (the quantizer's input) -> pitch
  (c) the committed tokenizer's pre-VQ pitch embedding -> pitch
  (d) the committed tokenizer's QUANTIZED pitch embedding -> pitch
  (e) the committed tokenizer's quantized ART embedding -> pitch
  (f) a freshly supervised encoder+head (no CFM, no VQ in the grad path)
      trained for a few hundred steps -> achievable pitch_loss floor

Run on CPU (mini 144-d fixtures).  python scripts/vq_pitch_probe.py
"""
import json
import sys
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
FIX = REPO / "tests" / "fixtures"


def ridge(X, y, Xh, yh, lam=1e-3):
    """Fit ridge on (X,y), report train/heldout pearson r."""
    X = np.asarray(X, np.float64)
    y = np.asarray(y, np.float64)
    mu, sd = X.mean(0), X.std(0) + 1e-8
    Xn = (X - mu) / sd
    A = Xn.T @ Xn + lam * len(X) * np.eye(X.shape[1])
    w = np.linalg.solve(A, Xn.T @ (y - y.mean()))
    def pred(Z):
        return ((np.asarray(Z, np.float64) - mu) / sd) @ w + y.mean()
    def r(a, b):
        a = a - a.mean(); b = b - b.mean()
        return float((a * b).sum() / (np.sqrt((a*a).sum()*(b*b).sum())+1e-12))
    return r(pred(X), y), r(pred(Xh), np.asarray(yh, np.float64))


def main():
    from sylber_tpu.io.checkpoint import load_params_npz
    from sylber_tpu.train.synthesis_loop import (build_synthesis_corpus,
                                                 precompute_features,
                                                 synthesis_config_from_dict)
    from sylber_tpu.flow.quantizer import (FFEncoder, unit_norm,
                                           unit_norm_sep, quantizer_forward)
    from sylber_tpu.train.vq_synthesis import (TrainedVQTokenizer,
                                               quantizer_config_from_dict)
    from sylber_tpu.synthesis import SegmentSynthesis, SynthesisParams

    meta = json.loads((FIX / "mini_vq_synth.json").read_text())
    model_cfg = meta["config"]["model"]
    sc = synthesis_config_from_dict(model_cfg)
    enc = load_params_npz(str(FIX / "mini_ckpt.npz"))
    synth = SegmentSynthesis(config=sc)
    synth.params = SynthesisParams(enc, synth.params.input_mlp,
                                   synth.params.regressor)
    norm_thr = float(model_cfg["norm_threshold"])

    n_tr, n_ho = 64, 24
    tr = build_synthesis_corpus(n_tr, 5.0, seed=0)
    ho = build_synthesis_corpus(n_ho, 5.0, seed=90001)
    f_tr = np.asarray(precompute_features(synth.hubert, synth.params.hubert,
                                          tr["wav"], norm_thr, 0.8))
    f_ho = np.asarray(precompute_features(synth.hubert, synth.params.hubert,
                                          ho["wav"], norm_thr, 0.8))
    L = min(f_tr.shape[1], tr["art"].shape[1])
    def sel(feats, art):
        feats, art = feats[:, :L], art[:, :L]
        nb = (feats ** 2).sum(-1) > 0
        voiced = art[..., 13] > 0.02
        m = nb & voiced
        return feats[m], art[..., 12][m], m
    Xtr, ytr, mtr = sel(f_tr, tr["art"])
    Xho, yho, mho = sel(f_ho, ho["art"])
    print(f"frames: train {len(ytr)}, heldout {len(yho)}; "
          f"pitch var train {ytr.var():.4f} mean {ytr.mean():.4f}")

    r_tr, r_ho = ridge(Xtr, ytr, Xho, yho)
    print(f"(a) raw features -> pitch:        r_train={r_tr:.3f} "
          f"r_heldout={r_ho:.3f}")

    Xtr_n = np.asarray(unit_norm(jnp.asarray(Xtr)))
    Xho_n = np.asarray(unit_norm(jnp.asarray(Xho)))
    r_tr, r_ho = ridge(Xtr_n, ytr, Xho_n, yho)
    print(f"(b) unit-normed features -> pitch: r_train={r_tr:.3f} "
          f"r_heldout={r_ho:.3f}")

    # committed tokenizer probes
    qd = meta["quantizer_config"]
    qcfg = quantizer_config_from_dict(
        {"output_dim": qd["output_dim"], "pitch_emb_dim": qd["pitch_emb_dim"],
         "hidden_dims": qd["hidden_dims"], "art_vq": qd["art_vq"],
         "pitch_vq": qd["pitch_vq"]}, input_dim=qd["input_dim"])
    tok = TrainedVQTokenizer.load_npz(str(FIX / "mini_vq_tokenizer.npz"), qcfg)
    pd = qcfg.pitch_emb_dim

    def probe_tok(feats, mask):
        out = quantizer_forward(tok.state, qcfg, jnp.asarray(feats))
        q = np.asarray(out["quantize"])
        pre = np.asarray(out["non_quantized"])
        return pre[mask], q[mask]
    pre_tr, q_tr = probe_tok(f_tr[:, :L], mtr)
    pre_ho, q_ho = probe_tok(f_ho[:, :L], mho)
    for name, A, B in [("(c) pre-VQ pitch emb", pre_tr[:, -pd:], pre_ho[:, -pd:]),
                       ("(d) quantized pitch emb", q_tr[:, -pd:], q_ho[:, -pd:]),
                       ("(e) quantized ART emb", q_tr[:, :-pd], q_ho[:, :-pd])]:
        r_tr, r_ho = ridge(A, ytr, B, yho)
        print(f"{name} -> pitch: r_train={r_tr:.3f} r_heldout={r_ho:.3f}")

    # (f) floor: supervised encoder+head alone (no CFM), same arch, ST VQ
    import optax
    from sylber_tpu.flow.quantizer import quantizer_init, vq_forward

    rng = jax.random.PRNGKey(0)
    qstate = quantizer_init(rng, qcfg)
    head = {"kernel": jnp.zeros((pd,)), "bias": jnp.zeros(())}
    params = {"enc": qstate.encoder, "head": head}
    opt = optax.adam(3e-4)
    ost = opt.init(params)
    Xall = jnp.asarray(f_tr[:, :L]).reshape(-1, f_tr.shape[-1])
    yall = jnp.asarray(tr["art"][:, :L, 12].reshape(-1))
    m_all = jnp.asarray(mtr.reshape(-1).astype(np.float32))

    @jax.jit
    def step(params, vq_state, ost, idx):
        x, y, m = Xall[idx], yall[idx], m_all[idx]
        def loss_fn(p):
            t = unit_norm(x)
            t = FFEncoder.apply(p["enc"], t, len(qcfg.hidden_dims))
            t = unit_norm_sep(t, True, pd)
            pq, pidx, closs = vq_forward(vq_state, qcfg.pitch_vq, t[..., -pd:])
            pred = pq @ p["head"]["kernel"] + p["head"]["bias"]
            err = ((pred - y) ** 2 * m).sum() / jnp.maximum(m.sum(), 1.0)
            return err + closs, (err, t[..., -pd:], pidx)
        (tot, (err, pre, pidx)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        up, ost = opt.update(g, ost, params)
        params = optax.apply_updates(params, up)
        from sylber_tpu.flow.quantizer import vq_ema_update
        vq_state = vq_ema_update(vq_state, qcfg.pitch_vq, pre, pidx)
        return params, vq_state, ost, err

    bs = 4096
    order = np.random.RandomState(0)
    pvq = qstate.pitch_vq
    for i in range(600):
        idx = jnp.asarray(order.randint(0, Xall.shape[0], bs))
        params, pvq, ost, err = step(params, pvq, ost, idx)
        if (i + 1) % 100 == 0:
            print(f"  (f) step {i+1}: supervised-only pitch MSE "
                  f"{float(err):.4f} (var {ytr.var():.4f})")


if __name__ == "__main__":
    main()
