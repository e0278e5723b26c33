"""Model tier (SURVEY.md §4): the Fast-WaveNet invariant.

train-mode forward ≡ ring-buffer incremental forward on the same params, and
the scan engine ≡ the naive full-context oracle sampler on identical seeds.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lb_wavenet_tpu.generate import (
    generate,
    generate_classes,
    naive_sample,
)
from lb_wavenet_tpu.models.wavenet import forward, init_params

from .util import MICRO

B, T = 2, 24


def _params():
    return init_params(jax.random.key(0), MICRO)


def test_incremental_logits_match_training_forward():
    """Teacher-forced scan logits == full-sequence forward logits."""
    params = _params()
    x = jax.random.randint(jax.random.key(1), (B, T), 0, 256)
    _, scan_logits = generate_classes(
        params,
        MICRO,
        jax.random.key(2),
        B,
        T,
        forced=x,
        return_logits=True,
    )
    zero = jnp.full((B, 1), MICRO.quant_channels // 2, jnp.int32)
    y = jnp.concatenate([zero, x[:, :-1]], axis=1)
    fwd_logits = jax.jit(lambda p, y: forward(p, MICRO, y))(params, y)
    np.testing.assert_allclose(
        np.asarray(scan_logits), np.asarray(fwd_logits), rtol=2e-5, atol=2e-5
    )


def test_scan_engine_matches_naive_oracle():
    """Free-running generation: identical class sequences, seed-for-seed."""
    params = _params()
    rng = jax.random.key(3)
    fast, fast_logits = generate_classes(
        params, MICRO, rng, B, T, return_logits=True, temperature=1.0
    )
    slow, slow_logits = naive_sample(
        params, MICRO, rng, B, T, temperature=1.0, return_logits=True
    )
    np.testing.assert_allclose(
        np.asarray(fast_logits), np.asarray(slow_logits), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_greedy_determinism_and_wav_range():
    params = _params()
    wav = generate(params, MICRO, jax.random.key(4), B, T, temperature=0.0)
    wav2 = generate(params, MICRO, jax.random.key(5), B, T, temperature=0.0)
    assert wav.shape == (B, T)
    # temperature=0 is greedy: rng must not matter.
    np.testing.assert_array_equal(np.asarray(wav), np.asarray(wav2))
    assert bool(jnp.all(jnp.isfinite(wav)))
    assert float(jnp.max(jnp.abs(wav))) <= 1.0


def test_conditioned_generation_shapes():
    from lb_wavenet_tpu.config import ArchConfig

    arch = ArchConfig(
        n_blocks=1,
        n_layers_per_block=3,
        residual_channels=8,
        skip_channels=8,
        gate_channels=8,
        n_mels=8,
        cond_channels=8,
        upsample_factors=(4, 4),
        n_speakers=4,
        speaker_embed_dim=6,
        compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    frames = jax.random.normal(jax.random.key(1), (B, 2, 8))
    wav = generate(
        params,
        arch,
        jax.random.key(2),
        B,
        32,  # = 2 frames * hop 16
        cond_frames=frames,
        speaker_ids=jnp.asarray([0, 3]),
    )
    assert wav.shape == (B, 32)
    assert bool(jnp.all(jnp.isfinite(wav)))


def test_streaming_chunks_bit_match_one_shot():
    """stream_chunk carries ring state, slot phase and the RNG chain across
    chunks: concatenated chunks == a single generate_classes call, for both
    scan engines."""
    from lb_wavenet_tpu.generate import (
        generate_classes,
        start_stream,
        stream_chunk,
    )

    params = init_params(jax.random.key(0), MICRO)
    total, chunk = 24, 6
    for engine in ("xla", "pallas"):
        one_shot = generate_classes(
            params, MICRO, jax.random.key(11), 2, total, engine=engine
        )
        stream = start_stream(MICRO, 2, jax.random.key(11))
        parts = []
        for _ in range(total // chunk):
            cls, stream = stream_chunk(
                params, MICRO, stream, chunk, engine=engine
            )
            parts.append(np.asarray(cls))
        np.testing.assert_array_equal(
            np.concatenate(parts, axis=1), np.asarray(one_shot),
            err_msg=f"engine={engine}",
        )


def test_generate_streaming_yields_waveform():
    from lb_wavenet_tpu.generate import generate_streaming

    params = init_params(jax.random.key(0), MICRO)
    chunks = list(
        generate_streaming(params, MICRO, jax.random.key(3), 2, 8, n_chunks=3)
    )
    assert len(chunks) == 3
    for c in chunks:
        assert c.shape == (2, 8)
        assert bool(jnp.all(jnp.isfinite(c)))
        assert float(jnp.abs(c).max()) <= 1.0


def test_streaming_conditioned_chunks_bit_match_one_shot():
    """Per-chunk cond slices (the documented streaming usage) reproduce the
    one-shot conditioned output; a whole-utterance cond array is rejected."""
    import pytest

    from lb_wavenet_tpu.config import ArchConfig
    from lb_wavenet_tpu.generate import (
        generate_classes,
        start_stream,
        stream_chunk,
    )
    from lb_wavenet_tpu.models.conditioning import upsample_cond

    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=3, residual_channels=8,
        skip_channels=8, gate_channels=8, n_mels=8, cond_channels=8,
        upsample_factors=(4,), n_speakers=4, speaker_embed_dim=6,
        compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    total, chunk = 16, 4
    frames = jax.random.normal(jax.random.key(1), (2, total // 4, 8))
    cond_full = upsample_cond(params["upsampler"], arch, frames, jnp.float32)
    spk = jnp.asarray([1, 3])
    one_shot = generate_classes(
        params, arch, jax.random.key(11), 2, total,
        cond=cond_full, speaker_ids=spk,
    )
    stream = start_stream(arch, 2, jax.random.key(11))
    parts = []
    for i in range(total // chunk):
        cls, stream = stream_chunk(
            params, arch, stream, chunk,
            cond=cond_full[:, i * chunk : (i + 1) * chunk],
            speaker_ids=spk,
        )
        parts.append(np.asarray(cls))
    np.testing.assert_array_equal(
        np.concatenate(parts, axis=1), np.asarray(one_shot)
    )
    # Whole-utterance cond (longer than the chunk) must be rejected, not
    # silently reused from frame 0.
    with pytest.raises(ValueError, match="exactly this chunk"):
        stream_chunk(params, arch, stream, chunk, cond=cond_full,
                     speaker_ids=spk)


def test_turbo_streaming_bit_matches_one_shot():
    """Turbo-engine streaming: chunked fused-step scans (carried rings +
    frontend; absolute-time slot/seed chains) bit-match the one-shot turbo
    run — greedy-primed AND sampled. Batch 3: no lane constraint."""
    from lb_wavenet_tpu.generate import (
        generate_classes,
        start_stream,
        stream_chunk,
    )

    params = init_params(jax.random.key(0), MICRO)
    total, chunk, b = 24, 6, 3
    forced_full = jnp.concatenate(
        [
            jax.random.randint(jax.random.key(6), (b, 8), 0, 256),
            jnp.full((b, total - 8), -1, jnp.int32),
        ],
        axis=1,
    )
    for temp, forced in ((0.0, forced_full), (1.0, None)):
        rng = jax.random.key(23)
        one_shot = generate_classes(
            params, MICRO, rng, b, total, forced=forced,
            temperature=temp, engine="turbo",
        )
        stream = start_stream(MICRO, b, rng, engine="turbo", params=params)
        parts = []
        for i in range(total // chunk):
            f = (
                forced[:, i * chunk : (i + 1) * chunk]
                if forced is not None else None
            )
            cls, stream = stream_chunk(
                params, MICRO, stream, chunk, forced=f,
                temperature=temp, engine="turbo",
            )
            parts.append(np.asarray(cls))
        np.testing.assert_array_equal(
            np.concatenate(parts, axis=1), np.asarray(one_shot),
            err_msg=f"temperature={temp}",
        )


def test_mega_streaming_bit_matches_one_shot():
    """Mega-engine streaming: chunked whole-loop kernel calls (carried ring
    buffer, staged pairs, frontend; absolute-time slot/seed chains)
    bit-match the one-shot mega run — greedy-primed AND sampled."""
    from lb_wavenet_tpu.generate import (
        generate_classes,
        start_stream,
        stream_chunk,
    )

    params = init_params(jax.random.key(0), MICRO)
    total, chunk = 24, 6
    forced_full = jnp.concatenate(
        [
            jax.random.randint(jax.random.key(6), (2, 8), 0, 256),
            jnp.full((2, total - 8), -1, jnp.int32),
        ],
        axis=1,
    )
    for temp, forced in ((0.0, forced_full), (1.0, None)):
        rng = jax.random.key(21)
        one_shot = generate_classes(
            params, MICRO, rng, 2, total, forced=forced,
            temperature=temp, engine="mega",
        )
        stream = start_stream(MICRO, 2, rng, engine="mega", params=params)
        parts = []
        for i in range(total // chunk):
            f = (
                forced[:, i * chunk : (i + 1) * chunk]
                if forced is not None else None
            )
            cls, stream = stream_chunk(
                params, MICRO, stream, chunk, forced=f,
                temperature=temp, engine="mega",
            )
            parts.append(np.asarray(cls))
        np.testing.assert_array_equal(
            np.concatenate(parts, axis=1), np.asarray(one_shot),
            err_msg=f"temperature={temp}",
        )


def test_streaming_invariant_across_randomized_archs():
    """Chunked streaming == one-shot, swept over randomized tiny archs AND
    irregular chunk splits (the RNG chain and ring-slot phase must continue
    across arbitrary chunk boundaries, incl. input_kernel == 3)."""
    import numpy as np

    from lb_wavenet_tpu.config import ArchConfig
    from lb_wavenet_tpu.generate import (
        generate_classes,
        start_stream,
        stream_chunk,
    )

    rng = np.random.default_rng(77)
    for trial in range(3):
        arch = ArchConfig(
            n_blocks=int(rng.integers(1, 3)),
            n_layers_per_block=int(rng.integers(2, 5)),
            residual_channels=int(rng.choice([4, 8])),
            skip_channels=int(rng.choice([4, 8])),
            gate_channels=int(rng.choice([4, 8])),
            input_kernel=int(rng.choice([2, 3])),
            # Sweep mu-law depth too (sampling + rings must not assume 256).
            quant_channels=int(rng.choice([64, 128, 256])),
            compute_dtype="float32",
        )
        params = init_params(jax.random.key(trial + 50), arch)
        b, total = 2, 18
        key = jax.random.key(trial + 500)
        one_shot = np.asarray(
            generate_classes(params, arch, key, b, total, temperature=1.0)
        )
        # Irregular split of `total` into 1..6-sample chunks.
        splits = []
        left = total
        while left:
            c = int(min(left, rng.integers(1, 7)))
            splits.append(c)
            left -= c
        stream = start_stream(arch, b, key)
        parts = []
        for c in splits:
            cls, stream = stream_chunk(params, arch, stream, c)
            parts.append(np.asarray(cls))
        np.testing.assert_array_equal(
            np.concatenate(parts, axis=1), one_shot,
            err_msg=f"trial {trial}: splits={splits}, "
                    f"K={arch.input_kernel}",
        )


def test_matmul_precision_audit_mode():
    """gen.matmul_precision plumbing (VERDICT r1 item 9): under
    jax.default_matmul_precision('highest') the XLA engine still bit-matches
    the Pallas engine. (On-chip, xla <-> pallas is already bit-exact at
    DEFAULT precision over 1000 free-running sampled steps; the knob only
    matters for fp32-compute archs. The xla <-> mega greedy drift at t=168
    is mega's merged-contraction accumulation order, which no precision
    flag undoes — ops/pallas/ar_mega.py, scripts/audit_check.py.)"""
    params = _params()
    rng = jax.random.key(11)
    with jax.default_matmul_precision("highest"):
        hi = generate_classes(
            params, MICRO, rng, B, T, engine="xla", temperature=1.0
        )
        hi_p = generate_classes(
            params, MICRO, rng, B, T, engine="pallas", temperature=1.0
        )
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(hi_p))


def test_fused_engines_general_input_kernel():
    """VERDICT r2 item 6: the fused engines (turbo/mega) support any
    input_kernel K >= 1 via an explicit carried embedding stack — greedy
    parity vs the xla engine, identical per-lane sampled streams, and
    chunked streaming continuation, at K = 1, 2, 3."""
    from lb_wavenet_tpu.config import ArchConfig
    from lb_wavenet_tpu.generate import start_stream, stream_chunk

    for k_taps in (1, 2, 3):
        _check_fused_k(k_taps, ArchConfig, start_stream, stream_chunk)


def _check_fused_k(k_taps, ArchConfig, start_stream, stream_chunk):
    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=3, residual_channels=8,
        skip_channels=8, gate_channels=8, input_kernel=k_taps,
        compute_dtype="float32",
    )
    params = init_params(jax.random.key(0), arch)
    ref = np.asarray(generate_classes(
        params, arch, jax.random.key(7), 2, 64, temperature=0.0,
        engine="xla",
    ))
    sampled = {}
    for eng in ("turbo", "mega"):
        got = np.asarray(generate_classes(
            params, arch, jax.random.key(7), 2, 64, temperature=0.0,
            engine=eng,
        ))
        np.testing.assert_array_equal(got, ref, err_msg=f"K={k_taps} {eng}")
        sampled[eng] = np.asarray(generate_classes(
            params, arch, jax.random.key(7), 2, 64, temperature=1.0,
            engine=eng,
        ))
        # streaming continuation across chunks
        stream = start_stream(arch, 2, jax.random.key(7), engine=eng,
                              params=params)
        parts = []
        for _ in range(4):
            cls, stream = stream_chunk(
                params, arch, stream, 16, temperature=1.0, engine=eng
            )
            parts.append(np.asarray(cls))
        np.testing.assert_array_equal(
            np.concatenate(parts, axis=1), sampled[eng],
            err_msg=f"K={k_taps} {eng} stream",
        )
    # turbo and mega consume identical per-lane hash noise.
    np.testing.assert_array_equal(sampled["turbo"], sampled["mega"])


def test_turbo_logits_one_shot_and_streaming():
    """Turbo now emits logits from its fused kernel (r3: the last engine-
    matrix gap): greedy logits bit-match the XLA engine (f32 interpret),
    and chunked streaming logits bit-match the one-shot sampled run."""
    from lb_wavenet_tpu.generate import start_stream, stream_chunk

    params = init_params(jax.random.key(0), MICRO)
    b, t = 3, 24
    key = jax.random.key(7)
    cx, lx = generate_classes(
        params, MICRO, key, b, t, temperature=0.0, engine="xla",
        return_logits=True,
    )
    ct, lt = generate_classes(
        params, MICRO, key, b, t, temperature=0.0, engine="turbo",
        return_logits=True,
    )
    np.testing.assert_array_equal(np.asarray(cx), np.asarray(ct))
    np.testing.assert_array_equal(np.asarray(lx), np.asarray(lt))

    c1, l1 = generate_classes(
        params, MICRO, key, b, t, temperature=1.0, engine="turbo",
        return_logits=True,
    )
    stream = start_stream(MICRO, b, key, engine="turbo", params=params)
    cs, ls = [], []
    for _ in range(3):
        cls, lg, stream = stream_chunk(
            params, MICRO, stream, t // 3, temperature=1.0, engine="turbo",
            return_logits=True,
        )
        cs.append(np.asarray(cls))
        ls.append(np.asarray(lg))
    np.testing.assert_array_equal(np.concatenate(cs, 1), np.asarray(c1))
    np.testing.assert_array_equal(np.concatenate(ls, 1), np.asarray(l1))
