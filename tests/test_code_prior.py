"""Autoregressive RVQ code prior (models/code_prior.py).

Capability beyond the reference: its stage-2 unconditional sampler draws
codes uniformly per level (reference models/vqvae.py sample()) which we
measured at 0-1.2% keep-rate (results/mixstats_r3/vqsample_*.json); the
prior learns the level-conditional structure instead. Tests: strict
causality, per-level legality of samples, learnability (overfit beats
the uniform-code entropy floor), and the train->sample CLI round trip
in the extract_code_indices.py on-disk format."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_scripts import run_script

from pytorch_vae_tpu.models.code_prior import (
    CodePrior,
    code_prior_loss,
    sample_codes,
)

M, Q, K = 4, 2, 8  # tiny: T=8 positions, 2 levels, 8 codes/level


def tiny_model(**kw):
    kw.setdefault("d_model", 32)
    kw.setdefault("n_layers", 2)
    kw.setdefault("n_heads", 2)
    kw.setdefault("dropout", 0.0)
    kw.setdefault("min_len", 10)
    kw.setdefault("max_len", 20)
    return CodePrior(n_tokens=M, num_q=Q, k_per=K, **kw)


def global_codes(rng, n):
    per_level = rng.integers(0, K, size=(n, M * Q)).astype(np.int32)
    return per_level + (np.arange(M * Q, dtype=np.int32) % Q) * K


def test_causality():
    """Perturbing codes at position t must not move logits at <= t (the
    input embedding is shifted right, so logits[t] may only depend on
    codes[:t])."""
    model = tiny_model()
    rng = np.random.default_rng(0)
    codes = jnp.asarray(global_codes(rng, 2))
    lengths = jnp.asarray([12, 17])
    variables = model.init(jax.random.PRNGKey(0), codes, lengths)
    base = model.apply(variables, codes, lengths)
    T = M * Q
    for t in [0, 3, T - 1]:
        poked = codes.at[:, t].set((codes[:, t] + 1) % K + (t % Q) * K)
        out = model.apply(variables, poked, lengths)
        np.testing.assert_allclose(out[:, : t + 1], base[:, : t + 1],
                                   rtol=0, atol=1e-6)
        if t + 1 < T:
            assert not np.allclose(out[:, t + 1:], base[:, t + 1:])


def test_length_bucket_moves_logits():
    model = tiny_model()
    codes = jnp.asarray(global_codes(np.random.default_rng(1), 1))
    variables = model.init(jax.random.PRNGKey(0), codes,
                           jnp.asarray([10]))
    a = model.apply(variables, codes, jnp.asarray([10]))
    b = model.apply(variables, codes, jnp.asarray([20]))
    assert not np.allclose(a, b)


def test_overfit_beats_uniform_floor():
    """On data where level-1 codes are a deterministic function of
    level-0 (the residual-conditioning structure uniform sampling
    ignores), a few hundred Adam steps must push NLL far below the
    log(K) uniform floor."""
    import optax

    rng = np.random.default_rng(2)
    n = 64
    lvl0 = rng.integers(0, K, size=(n, M)).astype(np.int32)
    seqs = np.zeros((n, M * Q), np.int32)
    seqs[:, 0::Q] = lvl0
    seqs[:, 1::Q] = (lvl0 * 3 + 1) % K + K  # global flat for level 1
    codes = jnp.asarray(seqs)
    lengths = jnp.asarray(rng.integers(10, 20, size=n))

    model = tiny_model()
    variables = model.init(jax.random.PRNGKey(0), codes, lengths)
    tx = optax.adam(3e-3)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(params, opt):
        def f(p):
            loss, _ = code_prior_loss(model, {"params": p}, codes, lengths)
            return loss
        loss, g = jax.value_and_grad(f)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    params = variables["params"]
    for _ in range(300):
        params, opt, loss = step(params, opt)
    # perfect level-1 prediction halves the per-position entropy budget;
    # demand well under half the uniform floor to prove real learning
    assert float(loss) < 0.5 * np.log(K), float(loss)


def test_sample_legal_and_deterministic():
    model = tiny_model()
    codes = jnp.asarray(global_codes(np.random.default_rng(3), 2))
    lengths = jnp.asarray([11, 19])
    variables = model.init(jax.random.PRNGKey(0), codes, lengths)
    s1 = np.asarray(sample_codes(model, variables, jax.random.PRNGKey(7),
                                 lengths, temperature=1.0))
    s2 = np.asarray(sample_codes(model, variables, jax.random.PRNGKey(7),
                                 lengths, temperature=1.0))
    s3 = np.asarray(sample_codes(model, variables, jax.random.PRNGKey(8),
                                 lengths, temperature=1.0, top_k=3))
    assert s1.shape == (2, M * Q)
    np.testing.assert_array_equal(s1, s2)
    assert not np.array_equal(s1, s3)
    for s in (s1, s3):
        lvl = np.arange(M * Q) % Q
        assert (s >= lvl * K).all() and (s < (lvl + 1) * K).all()


def test_cli_train_sample_roundtrip(tmp_path):
    """train_code_prior.py consumes an extract_code_indices.py layout and
    sample_code_prior.py emits a decode_with_vqvae.py-compatible one."""
    codes_dir = tmp_path / "codes"
    (codes_dir / "indices").mkdir(parents=True)
    rng = np.random.default_rng(4)
    with open(codes_dir / "manifest.jsonl", "w") as mf:
        for i in range(24):
            name = f"c{i:03d}"
            np.save(codes_dir / "indices" / f"{name}.npy",
                    global_codes(rng, 1)[0])
            mf.write(json.dumps({
                "name": name, "length": int(rng.integers(10, 20)),
                "indices_path": f"indices/{name}.npy"}) + "\n")
    json.dump({"num_quantizers": Q, "codes_per_level": K,
               "latent_tokens": M, "code_dim": 16},
              open(codes_dir / "meta.json", "w"))

    prior_dir = str(tmp_path / "prior")
    run_script("train_code_prior.py", [
        "--codes_dir", str(codes_dir), "--out", prior_dir,
        "--epochs", "3", "--batch", "8", "--d_model", "32",
        "--n_layers", "1", "--n_heads", "2"])
    assert os.path.exists(os.path.join(prior_dir, "prior.npz"))
    meta = json.load(open(os.path.join(prior_dir, "meta.json")))
    assert meta["model"]["num_q"] == Q and meta["model"]["k_per"] == K
    assert meta["uniform_nats_per_pos"] == pytest.approx(np.log(K))

    out_dir = str(tmp_path / "samples")
    run_script("sample_code_prior.py", [
        "--prior_dir", prior_dir, "--n", "6", "--out_dir", out_dir,
        "--temperature", "0.9", "--seed", "5"])
    recs = [json.loads(l) for l in
            open(os.path.join(out_dir, "manifest.jsonl"))]
    assert len(recs) == 6
    for rec in recs:
        idx = np.load(os.path.join(out_dir, rec["indices_path"]))
        assert idx.shape == (M * Q,) and idx.dtype == np.int32
        lvl = np.arange(M * Q) % Q
        assert (idx >= lvl * K).all() and (idx < (lvl + 1) * K).all()
        assert 10 <= rec["length"] < 20


def test_nucleus_sampling_legal_and_truncating():
    """top_p nucleus sampling (round-5 plumbing): samples stay level-legal,
    differ from the untruncated stream, and an extreme top_p ~ 0 collapses
    to greedy argmax (the nucleus always keeps the top token)."""
    model = tiny_model()
    codes = jnp.asarray(global_codes(np.random.default_rng(5), 2))
    lengths = jnp.asarray([11, 19])
    variables = model.init(jax.random.PRNGKey(0), codes, lengths)

    sp = np.asarray(sample_codes(model, variables, jax.random.PRNGKey(7),
                                 lengths, temperature=1.0, top_p=0.9))
    lvl = np.arange(M * Q) % Q
    assert (sp >= lvl * K).all() and (sp < (lvl + 1) * K).all()

    # top_p -> 0 keeps exactly the argmax token: two different keys agree
    g1 = np.asarray(sample_codes(model, variables, jax.random.PRNGKey(1),
                                 lengths, temperature=1.0, top_p=1e-9))
    g2 = np.asarray(sample_codes(model, variables, jax.random.PRNGKey(2),
                                 lengths, temperature=1.0, top_p=1e-9))
    np.testing.assert_array_equal(g1, g2)

    # an aggressive nucleus must actually truncate: the sampled stream
    # differs from the full-distribution stream under the same key. Use
    # top_p=0.3, not 0.9: at near-uniform init logits over K=8 codes a
    # 0.9 nucleus keeps ~7/8 tokens, so all 16 positions coincide with
    # the untruncated stream ~0.9^16 = 19% of the time per PRNG stream
    # (observed under 'rbg'); 0.3 keeps ~2-3 tokens -> P(coincide) ~ 4e-9.
    full = np.asarray(sample_codes(model, variables, jax.random.PRNGKey(7),
                                   lengths, temperature=1.0))
    sp_low = np.asarray(sample_codes(model, variables, jax.random.PRNGKey(7),
                                     lengths, temperature=1.0, top_p=0.3))
    assert (sp_low >= lvl * K).all() and (sp_low < (lvl + 1) * K).all()
    assert not np.array_equal(sp_low, full)
