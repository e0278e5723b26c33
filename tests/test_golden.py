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
