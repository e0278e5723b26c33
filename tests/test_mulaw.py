"""Unit tier (SURVEY.md §4): mu-law round-trip and closed-form values."""
import jax.numpy as jnp
import numpy as np

from lb_wavenet_tpu.ops.mulaw import mu_law_decode, mu_law_encode


def test_round_trip_error_bounded():
    x = jnp.asarray(np.linspace(-1, 1, 4097, dtype=np.float32))
    y = mu_law_encode(x)
    x2 = mu_law_decode(y)
    # Mu-law quantization error is small near 0 and bounded everywhere.
    assert float(jnp.max(jnp.abs(x - x2))) < 0.04
    # Max decode error for |x| < 0.1 is (1 + mu|x|) ln(1+mu)/mu / 255 ≈ 2.3e-3.
    assert float(jnp.max(jnp.abs(x - x2)[jnp.abs(x) < 0.1])) < 2.5e-3


def test_class_range_and_extremes():
    x = jnp.asarray([-1.0, -0.999, 0.0, 0.999, 1.0], dtype=jnp.float32)
    y = np.asarray(mu_law_encode(x))
    assert y.min() >= 0 and y.max() <= 255
    assert y[0] == 0 and y[-1] == 255
    # Zero maps to the first positive class (mid-rise straddle).
    assert y[2] in (127, 128)


def test_encode_is_monotonic():
    x = jnp.asarray(np.linspace(-1, 1, 20001, dtype=np.float32))
    y = np.asarray(mu_law_encode(x))
    assert np.all(np.diff(y) >= 0)
    assert len(np.unique(y)) == 256  # every class reachable


def test_decode_inverts_companding_exactly_at_centers():
    y = jnp.arange(256)
    x = mu_law_decode(y)
    y2 = mu_law_encode(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_idempotent_clipping():
    x = jnp.asarray([-2.0, 2.0], dtype=jnp.float32)
    y = np.asarray(mu_law_encode(x))
    assert y[0] == 0 and y[1] == 255
