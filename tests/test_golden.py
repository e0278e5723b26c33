"""North-star parity tier (SURVEY.md §4): fixed-seed golden sample sequences.

The reference mount is empty (SURVEY.md §0), so the goldens pin THIS
framework's deterministic sampling chain (init seed 0, sample seed 42, tiny
BASELINE config 1) against regressions; when the reference becomes available
they are to be regenerated against it for true cross-implementation
bit-matching. Any change to mu-law constants, init, RNG consumption, or
engine semantics trips this test.
"""
import os

import jax
import numpy as np

from lb_wavenet_tpu.config import ArchConfig
from lb_wavenet_tpu.generate import generate_classes
from lb_wavenet_tpu.models.wavenet import init_params

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "tiny_seed42.npz")

TINY = ArchConfig(
    n_blocks=2,
    n_layers_per_block=5,
    residual_channels=32,
    skip_channels=32,
    gate_channels=32,
    compute_dtype="float32",
)


def test_fixed_seed_sample_sequence_bit_matches_golden():
    params = init_params(jax.random.key(0), TINY)
    cls = generate_classes(
        params, TINY, jax.random.key(42), 2, 64, temperature=1.0
    )
    want = np.load(GOLDEN)["classes"]
    np.testing.assert_array_equal(np.asarray(cls), want)


COND_GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "conditioned_seed7.npz"
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


def test_conditioned_sample_sequence_bit_matches_golden():
    """Pins the mel+speaker-conditioned chain: upsampler, per-gate
    injection, speaker embedding, and RNG consumption."""
    import jax.numpy as jnp

    from lb_wavenet_tpu.models.conditioning import upsample_cond

    params = init_params(jax.random.key(0), COND_ARCH)
    frames = jax.random.normal(jax.random.key(1), (2, 10, 8))
    cond = upsample_cond(params["upsampler"], COND_ARCH, frames, jnp.float32)
    cls = generate_classes(
        params, COND_ARCH, jax.random.key(7), 2, 40,
        cond=cond, speaker_ids=jnp.asarray([1, 3]),
    )
    want = np.load(COND_GOLDEN)["classes"]
    np.testing.assert_array_equal(np.asarray(cls), want)


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
    want = np.load(COND_GOLDEN)["train_losses"]
    np.testing.assert_allclose(np.asarray(losses), want, rtol=1e-6)
