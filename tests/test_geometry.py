"""Unit tier (SURVEY.md §4): window/mask geometry and receptive-field math."""
import numpy as np

from lb_wavenet_tpu.config import ArchConfig
from lb_wavenet_tpu.ops.geometry import (
    extract_window,
    num_windows,
    receptive_field,
    window_bounds,
)


def test_receptive_field_formula():
    # 2 blocks x 5 layers: dilations 1,2,4,8,16 twice -> sum 62; +1 input conv.
    arch = ArchConfig(n_blocks=2, n_layers_per_block=5)
    assert arch.dilations == (1, 2, 4, 8, 16) * 2
    assert arch.receptive_field == 1 + 1 + 62 == 64
    assert receptive_field(arch.dilations, 2) == 64
    # WaveNet-30: 3x10 -> 3 * 1023 + 2.
    arch30 = ArchConfig(n_blocks=3, n_layers_per_block=10)
    assert arch30.receptive_field == 3 * 1023 + 2


def test_num_windows_covers_all_targets():
    for file_len in [1, 2, 5, 100, 101, 4097]:
        for w in [1, 7, 100]:
            n = num_windows(file_len, w)
            if file_len < 2:
                assert n == 0
                continue
            covered = []
            for i in range(n):
                t0, t1 = window_bounds(file_len, w, i)
                covered.extend(range(t0, t1))
            assert covered == list(range(1, file_len))


def test_extract_window_alignment():
    rng = np.random.default_rng(0)
    encoded = rng.integers(0, 256, size=300).astype(np.int32)
    w, r = 50, 64
    inputs, targets, mask = extract_window(encoded, w, r, index=2)
    t0 = 1 + 2 * w  # 101
    assert inputs.shape == (r - 1 + w,)
    assert targets.shape == (w,) and mask.shape == (w,)
    # inputs cover samples [t0 - r, t0 + w - 1)
    np.testing.assert_array_equal(inputs, encoded[t0 - r : t0 + w - 1])
    np.testing.assert_array_equal(targets, encoded[t0 : t0 + w])
    # interior window with full context: all ones
    assert mask.sum() == w
    # Teacher-forcing alignment: the model's logit for input position j
    # (absolute sample t0 - r + j... last W inputs) predicts targets.
    # Check the "inputs shifted by one" identity on the overlap:
    np.testing.assert_array_equal(inputs[r:], targets[:-1])


def test_extract_window_boundary_masks():
    encoded = np.arange(130, dtype=np.int32) % 256
    w, r = 100, 64
    # Window 0: targets 1..100; targets with t < r are masked.
    inputs, targets, mask = extract_window(encoded, w, r, 0)
    assert mask[: r - 1].sum() == 0  # targets 1..63 masked (partial context)
    assert mask[r - 1 :].sum() == w - (r - 1)  # targets 64..100 trained
    # Left context before file start is zero-padded.
    assert (inputs[: r - 1] == 0).all()
    # Window 1: targets 101..129 real, rest padding-masked.
    inputs, targets, mask = extract_window(encoded, w, r, 1)
    assert mask.sum() == 29
    assert (mask[29:] == 0).all()
    np.testing.assert_array_equal(targets[:29], encoded[101:130])


def test_lane_continuous_batches():
    """Reference-style virtual-batch lanes: staggered cursors on one
    circular file-permutation sequence — per-lane continuity, no in-batch
    duplicates, full corpus coverage every ceil(n/B) steps, O(1) resume."""
    from lb_wavenet_tpu.config import TrainConfig
    from lb_wavenet_tpu.data import LaneSchedule, make_batches, synthetic_corpus

    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=3, residual_channels=8,
        skip_channels=8, gate_channels=8, compute_dtype="float32",
    )
    train = TrainConfig(batch_size=4, window_size=100, lane_continuous=True)
    corpus = synthetic_corpus(arch, 100, n_files=3, file_len=1000)

    sched = LaneSchedule(corpus, train)
    n = sched.n
    assert n == len(corpus.index)
    for k in range(4):
        seq = [sched.pair(k, s) for s in range(n)]
        # Full coverage per lane over one circle.
        assert sorted(seq) == sorted(corpus.index)
        # Continuity: windows advance sequentially within a file (except
        # at the single circular wrap point).
        breaks = 0
        for (f0, w0), (f1, w1) in zip(seq, seq[1:]):
            ok = (f1 == f0 and w1 == w0 + 1) or (f1 != f0 and w1 == 0)
            if not ok:
                breaks += 1
        assert breaks <= 1  # only the wrap of the circular sequence
    # No duplicates within any batch; union over ceil(n/B) steps == corpus.
    seen = set()
    for s in range(-(-n // 4)):
        batch_pairs = [sched.pair(k, s) for k in range(4)]
        assert len(set(batch_pairs)) == 4
        seen.update(batch_pairs)
    assert seen == set(corpus.index)

    # Batch content matches the schedule, including mid-stream start.
    it = make_batches(corpus, train, start_step=5)
    b5 = next(it)
    for k in range(4):
        fi, wi = sched.pair(k, 5)
        exp_inputs, exp_targets, _ = corpus.example(fi, wi)
        np.testing.assert_array_equal(b5.inputs[k], exp_inputs)
        np.testing.assert_array_equal(b5.targets[k], exp_targets)

    # Strided host sharding: host0 gets lanes 0,2; host1 gets lanes 1,3.
    h0 = next(make_batches(corpus, train, host_id=0, host_count=2))
    h1 = next(make_batches(corpus, train, host_id=1, host_count=2))
    full = next(make_batches(corpus, train))
    np.testing.assert_array_equal(h0.inputs, full.inputs[0::2])
    np.testing.assert_array_equal(h1.inputs, full.inputs[1::2])


def test_default_loader_epoch_exactly_once():
    """Sampling-without-replacement semantics hold ACROSS epoch seams: when
    n % batch_size != 0, a boundary-spanning batch draws its tail rows from
    the next epoch's permutation head (per-row epoch indexing) instead of
    wrapping into the current epoch — every window appears exactly once per
    epoch (VERDICT r4 weak #7)."""
    from collections import Counter

    from lb_wavenet_tpu.config import TrainConfig
    from lb_wavenet_tpu.data import make_batches, synthetic_corpus

    arch = ArchConfig(
        n_blocks=1, n_layers_per_block=3, residual_channels=8,
        skip_channels=8, gate_channels=8, compute_dtype="float32",
    )
    train = TrainConfig(batch_size=4, window_size=100, seed=3)
    corpus = synthetic_corpus(arch, 100, n_files=3, file_len=1000)
    n = len(corpus.index)
    assert n % train.batch_size != 0  # the seam case under test

    # Identify windows by their input bytes (distinct for this corpus).
    key_to_pair = {}
    for fi, wi in corpus.index:
        inp, _, _ = corpus.example(fi, wi)
        key_to_pair[inp.tobytes()] = (fi, wi)
    assert len(key_to_pair) == n

    b = train.batch_size
    n_epochs = 2
    assert (n_epochs * n) % b == 0  # 60 rows = 15 whole batches
    it = make_batches(corpus, train)
    per_epoch = [Counter() for _ in range(n_epochs)]
    for step in range(n_epochs * n // b):
        batch = next(it)
        for k in range(b):
            g = step * b + k
            per_epoch[g // n][key_to_pair[batch.inputs[k].tobytes()]] += 1
    for epoch in range(n_epochs):
        assert per_epoch[epoch] == Counter(corpus.index), (
            f"epoch {epoch} is not an exact permutation of the corpus"
        )

    # Exact resume across the seam: restarting at any step reproduces the
    # same stream (the dataset cursor stays just the step count).
    seam_step = n // b  # the batch that spans the epoch boundary
    resumed = next(make_batches(corpus, train, start_step=seam_step))
    fresh = make_batches(corpus, train)
    for _ in range(seam_step):
        next(fresh)
    np.testing.assert_array_equal(resumed.inputs, next(fresh).inputs)
