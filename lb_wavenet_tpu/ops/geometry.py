"""Window / receptive-field / mask geometry for teacher-forced training.

Reference parity: the reference slices each wav file into training windows of
W trainable samples prefixed by `receptive_field - 1` samples of left context
("lookback"), and masks the loss wherever a window's receptive field would
cross a file boundary (SURVEY.md §2.1 "Audio dataset / windowing", §5
"Long-context"). This module owns that arithmetic so the data pipeline, the
model, and the tests all agree on it.

Teacher-forcing convention used throughout this framework:
  - A training example is `window` of encoded classes with length
    R - 1 + W + 1  (left context, W trainable positions, plus the final
    target sample).
  - inputs  = window[:-1]   (length R - 1 + W)
  - targets = window[R-1+1 : ]  i.e. the model's logits at position t predict
    window[t + 1]; only the last W logits are trained (the first R - 1 sit on
    incomplete context within the file slice and are either genuine history
    (mask 1 upstream of the slice) or padding (mask 0)).
"""
from __future__ import annotations

import numpy as np


def receptive_field(dilations, input_kernel: int = 2) -> int:
    """R = 1 + (input_kernel - 1) + sum(dilations) for width-2 dilated taps."""
    return 1 + (input_kernel - 1) + int(sum(dilations))


def num_windows(file_len: int, window_size: int) -> int:
    """Number of W-sized training windows a file of file_len samples yields.

    Every sample of the file is a target in exactly one window (final partial
    window is kept and right-padded/masked); files shorter than 2 samples
    yield nothing (need at least one input→target pair).
    """
    if file_len < 2:
        return 0
    # Targets are positions 1..file_len-1 (the first sample has no history).
    n_targets = file_len - 1
    return -(-n_targets // window_size)  # ceil


def window_bounds(file_len: int, window_size: int, index: int):
    """Target range [t0, t1) within the file covered by window `index`."""
    t0 = 1 + index * window_size
    t1 = min(t0 + window_size, file_len)
    return t0, t1


def extract_window(
    encoded: np.ndarray,
    window_size: int,
    r_field: int,
    index: int,
    pad_value: int = 0,
):
    """Slice one training window with left context and boundary mask.

    Args:
      encoded: int array, the whole file's mu-law classes, shape [file_len].
      window_size: W, trainable targets per window.
      r_field: receptive field R of the model.
      index: which window of this file (0 .. num_windows-1).

    Returns:
      inputs:  int32 [R - 1 + W]  (model input sequence)
      targets: int32 [W]          (next-sample classes for the last W logits)
      mask:    float32 [W]        (1 where the target is real AND its full
                                   receptive field lies inside the file;
                                   0 on padding. Note: targets near the file
                                   start whose receptive field would precede
                                   the file are masked 0 — "no window's
                                   receptive field crosses files".)
    """
    file_len = len(encoded)
    t0, t1 = window_bounds(file_len, window_size, index)
    w = window_size
    # Input positions feeding targets [t0, t0+w): samples [t0 - R, t0 + w - 1).
    in_start = t0 - r_field
    in_stop = t0 + w - 1
    idx = np.arange(in_start, in_stop)
    valid_in = (idx >= 0) & (idx < file_len)
    inputs = np.where(valid_in, encoded[np.clip(idx, 0, file_len - 1)], pad_value)

    tgt_idx = np.arange(t0, t0 + w)
    valid_t = tgt_idx < t1
    targets = np.where(valid_t, encoded[np.clip(tgt_idx, 0, file_len - 1)], pad_value)

    # Full receptive field of target t covers samples [t - R, t); require >= 0.
    full_context = (tgt_idx - r_field) >= 0
    mask = (valid_t & full_context).astype(np.float32)
    return inputs.astype(np.int32), targets.astype(np.int32), mask
