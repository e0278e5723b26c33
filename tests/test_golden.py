"""North-star parity tier (SURVEY.md §4): framework ≡ INDEPENDENT oracle.

The reference mount is empty (SURVEY.md §0), so true cross-implementation
bit-matching is impossible; the next-best external check is a paper-exact
re-derivation: tests/fast_wavenet_oracle.py implements the Fast-WaveNet
FIFO-queue incremental sampler (arXiv 1611.09482) in pure NumPy, sharing no
code with the framework's ring-buffer/Pallas engines. The goldens in
tests/goldens/oracle_goldens.npz are generated FROM THE ORACLE
(scripts/make_goldens.py); the tests assert the framework's engines
reproduce them bit-for-bit — 512-sample sequences, 3 seeds, plus
conditioned and primed (greedy + sampled) cases. Any change to mu-law
constants, init, RNG consumption, or engine semantics trips this tier.

When the reference mount is fixed, regenerate the goldens against the real
reference instead (same file layout) and re-run.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from lb_wavenet_tpu.config import ArchConfig
from lb_wavenet_tpu.generate import generate_classes
from lb_wavenet_tpu.models.wavenet import init_params
from lb_wavenet_tpu.ops.mulaw import mu_law_encode

from .fast_wavenet_oracle import fifo_generate

GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "oracle_goldens.npz"
)
LEGACY_GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "conditioned_seed7.npz"
)

# BASELINE.json config 1 (tiny 2x5x32) — the parity substrate.
TINY = ArchConfig(
    n_blocks=2,
    n_layers_per_block=5,
    residual_channels=32,
    skip_channels=32,
    gate_channels=32,
    compute_dtype="float32",
)

COND_ARCH = ArchConfig(
    n_blocks=1,
    n_layers_per_block=3,
    residual_channels=8,
    skip_channels=8,
    gate_channels=8,
    n_mels=8,
    cond_channels=8,
    upsample_factors=(4,),
    n_speakers=4,
    speaker_embed_dim=6,
    compute_dtype="float32",
)


def primed_forced() -> np.ndarray:
    """(2, 256) priming plan: 64 forced samples of mu-law-encoded sinusoids
    (220 / 330 Hz at 16 kHz, amplitude 0.5), then -1 (free-running)."""
    t = np.arange(64) / 16000.0
    wav = 0.5 * np.sin(2 * np.pi * np.asarray([[220.0], [330.0]]) * t[None])
    prime = np.asarray(mu_law_encode(jnp.asarray(wav)), np.int32)
    return np.concatenate(
        [prime, np.full((2, 192), -1, np.int32)], axis=1
    )


def _golden(name: str) -> np.ndarray:
    return np.load(GOLDEN)[name]


def test_free_running_sampled_matches_live_oracle():
    """xla engine ≡ the FIFO-queue oracle, run live, seed-for-seed."""
    params = init_params(jax.random.key(0), TINY)
    want = fifo_generate(
        params, TINY, jax.random.key(42), 2, 512, temperature=1.0
    )
    got = generate_classes(
        params, TINY, jax.random.key(42), 2, 512, temperature=1.0
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_free_running_golden_pins_three_seeds():
    """xla engine ≡ oracle-generated goldens: 512 samples x 3 seeds; the
    pallas engine (bit-matches xla incl. the RNG stream) on one seed."""
    params = init_params(jax.random.key(0), TINY)
    for seed in (42, 7, 123):
        got = generate_classes(
            params, TINY, jax.random.key(seed), 2, 512, temperature=1.0
        )
        np.testing.assert_array_equal(
            np.asarray(got), _golden(f"tiny_seed{seed}"),
            err_msg=f"seed={seed}",
        )
    got = generate_classes(
        params, TINY, jax.random.key(42), 2, 512, temperature=1.0,
        engine="pallas",
    )
    np.testing.assert_array_equal(np.asarray(got), _golden("tiny_seed42"))


def test_conditioned_sequence_matches_oracle_golden():
    """Mel + speaker conditioned chain (upsampler, per-gate injection,
    speaker embedding, RNG consumption) ≡ oracle, live and pinned."""
    from lb_wavenet_tpu.models.conditioning import upsample_cond

    params = init_params(jax.random.key(0), COND_ARCH)
    frames = jax.random.normal(jax.random.key(1), (2, 64, COND_ARCH.n_mels))
    cond = upsample_cond(params["upsampler"], COND_ARCH, frames, jnp.float32)
    spk = jnp.asarray([1, 3])
    want = fifo_generate(
        params, COND_ARCH, jax.random.key(7), 2, 256,
        cond=np.asarray(cond), speaker_ids=np.asarray([1, 3]),
    )
    np.testing.assert_array_equal(want, _golden("cond_seed7"))
    got = generate_classes(
        params, COND_ARCH, jax.random.key(7), 2, 256,
        cond=cond, speaker_ids=spk,
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_primed_greedy_all_four_engines_match_oracle_golden():
    """The reference's primed-queue mode, greedy: every engine (xla,
    pallas, turbo, mega) reproduces the oracle's sequence bit-for-bit —
    the deterministic tier where even the TPU-PRNG engines must agree."""
    params = init_params(jax.random.key(0), TINY)
    forced = primed_forced()
    np.testing.assert_array_equal(forced, _golden("primed_forced"))
    want = _golden("primed_greedy")
    for engine in ("xla", "pallas", "turbo", "mega"):
        got = generate_classes(
            params, TINY, jax.random.key(0), 2, 256,
            forced=jnp.asarray(forced), temperature=0.0, engine=engine,
        )
        np.testing.assert_array_equal(
            np.asarray(got), want, err_msg=f"engine={engine}"
        )


def test_fused_default_sampled_matches_oracle_golden():
    """The fused engines' DEFAULT sampled path (per-lane counter hash) ≡
    oracle goldens, seed-for-seed — turbo and mega consume identical,
    platform-independent noise (VERDICT r2 item 3); the scan engines driven
    with the same derived lane seeds reproduce the very same stream."""
    from lb_wavenet_tpu.generate import (
        _seed_base, derive_lane_seeds, start_stream, stream_chunk,
    )

    params = init_params(jax.random.key(0), TINY)
    for seed in (5, 21):
        want = _golden(f"tiny_perlane_seed{seed}")
        for engine in ("turbo", "mega"):
            got = generate_classes(
                params, TINY, jax.random.key(seed), 2, 512, temperature=1.0,
                engine=engine,
            )
            np.testing.assert_array_equal(
                np.asarray(got), want, err_msg=f"engine={engine} seed={seed}"
            )
    # xla engine, explicit lane seeds derived the same way == same stream.
    key = jax.random.key(5)
    lane_seed = derive_lane_seeds(_seed_base(key), 2)
    stream = start_stream(TINY, 2, key, engine="xla")
    cls, _ = stream_chunk(
        params, TINY, stream, 512, temperature=1.0, engine="xla",
        lane_seed=lane_seed, lane_t0=jnp.zeros(2, jnp.int32),
    )
    np.testing.assert_array_equal(
        np.asarray(cls), _golden("tiny_perlane_seed5")
    )


def test_fused_default_sampled_matches_live_oracle():
    """Live (non-golden) pin of the per-lane default: mega ≡ the oracle's
    NumPy hash re-derivation run fresh."""
    params = init_params(jax.random.key(0), TINY)
    want = fifo_generate(
        params, TINY, jax.random.key(33), 2, 256, temperature=1.0,
        perlane=True,
    )
    got = generate_classes(
        params, TINY, jax.random.key(33), 2, 256, temperature=1.0,
        engine="mega",
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_primed_sampled_matches_oracle_golden():
    """Primed then free-running SAMPLED: the RNG chain must keep splitting
    during the forced prefix exactly like the oracle does."""
    params = init_params(jax.random.key(0), TINY)
    forced = jnp.asarray(primed_forced())
    want = _golden("primed_seed9")
    for engine in ("xla", "pallas"):
        got = generate_classes(
            params, TINY, jax.random.key(9), 2, 256,
            forced=forced, temperature=1.0, engine=engine,
        )
        np.testing.assert_array_equal(
            np.asarray(got), want, err_msg=f"engine={engine}"
        )


def test_training_trajectory_matches_golden(tmp_path):
    """Pins the FULL training slice end to end: synthetic corpus windowing,
    masked loss, Adam update order, metrics — 5 fixed-seed steps."""
    from lb_wavenet_tpu.config import Config, TrainConfig
    from lb_wavenet_tpu.data import synthetic_corpus
    import lb_wavenet_tpu.train as tm

    cfg = Config(
        arch=TINY,
        train=TrainConfig(
            batch_size=4, mesh_data=4, window_size=256, n_steps=5, log_every=1,
            checkpoint_every=1000, checkpoint_dir=str(tmp_path / "ck"),
            learning_rate=1e-3, seed=0,
        ),
    )
    corpus = synthetic_corpus(cfg.arch, cfg.train.window_size, n_files=2,
                              file_len=4000)
    losses = []
    orig = tm.MetricsLogger.log

    def cap(self, **kw):
        if "loss" in kw:
            losses.append(kw["loss"])
        orig(self, **kw)

    tm.MetricsLogger.log = cap
    try:
        tm.run_training(cfg, corpus=corpus)
    finally:
        tm.MetricsLogger.log = orig
    want = np.load(LEGACY_GOLDEN)["train_losses"]
    np.testing.assert_allclose(np.asarray(losses), want, rtol=1e-6)


def test_pool_recycled_lane_sampled_matches_oracle():
    """Streaming + reset golden (VERDICT r2 item 9): a mega SessionPool
    request landing on a RECYCLED lane mid-stream, sampled with a pinned
    per-lane seed, reproduces the INDEPENDENT NumPy oracle's dedicated
    free-running session for that seed — the whole serving stack (chunked
    mega kernel, reset_lanes state surgery, per-lane hash) pinned against
    an external re-derivation."""
    from lb_wavenet_tpu.serving import SessionPool

    params = init_params(jax.random.key(0), TINY)
    CH = 16
    pool = SessionPool(params, TINY, batch=2, rng=jax.random.key(3),
                       engine="mega", chunk_size=CH, temperature=1.0)
    assert pool.submit("warm0", n_samples=CH, seed=11)
    assert pool.submit("warm1", n_samples=2 * CH, seed=12)
    got = {}
    submitted = False
    for _ in range(40):
        if not pool.active and submitted:
            break
        for rid, (cls, fin) in pool.step().items():
            got.setdefault(rid, []).append(cls)
        if not submitted and pool.free_lanes() > 0:
            submitted = pool.submit("pinned", n_samples=3 * CH, seed=4242)
    assert submitted and not pool.active
    pooled = np.concatenate(got["pinned"])

    want = fifo_generate(
        params, TINY, jax.random.key(0), 1, 3 * CH, temperature=1.0,
        perlane_seeds=np.asarray([4242]),
    )[0]
    np.testing.assert_array_equal(pooled, want)


def test_training_trajectory_50_steps_with_eval(tmp_path):
    """Long-horizon training pin (VERDICT r2 item 9): 50 fixed-seed steps
    of the full slice (windowing, masked CE, Adam) plus a held-out eval —
    loss curve AND eval metrics against the checked-in golden."""
    from lb_wavenet_tpu.config import Config, TrainConfig
    from lb_wavenet_tpu.data import synthetic_corpus
    from lb_wavenet_tpu.eval import evaluate
    import lb_wavenet_tpu.train as tm

    cfg = Config(
        arch=TINY,
        train=TrainConfig(
            batch_size=4, mesh_data=4, window_size=256, n_steps=50,
            log_every=10, checkpoint_every=1000,
            checkpoint_dir=str(tmp_path / "ck"),
            learning_rate=1e-3, seed=0,
        ),
    )
    corpus = synthetic_corpus(cfg.arch, cfg.train.window_size, n_files=2,
                              file_len=4000)
    losses = []
    orig = tm.MetricsLogger.log

    def cap(self, **kw):
        if "loss" in kw:
            losses.append(kw["loss"])
        orig(self, **kw)

    tm.MetricsLogger.log = cap
    try:
        state = tm.run_training(cfg, corpus=corpus)
    finally:
        tm.MetricsLogger.log = orig
    ev = evaluate(state.params, cfg.arch, corpus, 4, max_batches=2)
    golden = np.load(os.path.join(
        os.path.dirname(__file__), "goldens", "train_traj50.npz"
    ))
    np.testing.assert_allclose(np.asarray(losses), golden["losses"],
                               rtol=1e-5)
    np.testing.assert_allclose(
        [ev["nll"], ev["accuracy"]], golden["eval"], rtol=1e-5
    )
