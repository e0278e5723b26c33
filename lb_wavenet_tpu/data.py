"""Input pipeline: wav corpus -> batched teacher-forcing windows.

Reference parity: the reference reads a 16 kHz wav corpus, mu-law encodes it,
slices it into fixed-size training windows with `receptive_field - 1` samples
of left context, masks loss at file boundaries, and batches across files
(SURVEY.md §2.1 "Audio dataset / windowing", §3.1).

TPU-first realization (no tf.data): a deterministic, seeded, pure-numpy
loader. Files are mu-law encoded once into an in-memory corpus (raw 16 kHz
speech corpora are small relative to host RAM); each epoch is a seeded
permutation of all (file, window) pairs; each host takes a disjoint strided
shard of every batch (`host_id::host_count`), so the global batch order is
identical regardless of host count — the property the cross-host determinism
tests rely on (SURVEY.md §5 "Race detection", §7 hard parts). Arrays are
produced host-local; the caller turns them into sharded global arrays with
`jax.make_array_from_process_local_data`.

For the mel-conditioned configs the loader also emits per-window mel frames
covering the window's input span, computed from the float waveform.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Iterator, Optional, Sequence

import numpy as np

from .config import ArchConfig, TrainConfig
from .ops import geometry
from .ops.mulaw import mu_law_encode


@functools.lru_cache(maxsize=16)
def _jitted_log_mel(n_mels: int, hop: int, sample_rate: int):
    """Jitted batched log-mel (one compile per (params, input shape))."""
    import jax

    from .ops.mel import log_mel_spectrogram

    return jax.jit(
        functools.partial(
            log_mel_spectrogram,
            n_mels=n_mels,
            hop=hop,
            sample_rate=sample_rate,
        )
    )


def load_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a wav file to float32 in [-1, 1]. scipy-based; no librosa."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    return data, sr


def write_wav(path: str, wav: np.ndarray, sample_rate: int) -> None:
    from scipy.io import wavfile

    wav = np.clip(np.asarray(wav, dtype=np.float32), -1.0, 1.0)
    wavfile.write(path, sample_rate, (wav * 32767.0).astype(np.int16))


@dataclasses.dataclass
class Batch:
    """One training batch (host-local shard)."""

    inputs: np.ndarray   # int32 (B, R-1+W)   mu-law classes
    targets: np.ndarray  # int32 (B, W)
    mask: np.ndarray     # float32 (B, W)
    mel: Optional[np.ndarray] = None       # float32 (B, F, n_mels)
    speaker: Optional[np.ndarray] = None   # int32 (B,)


def discover_layout(data_dir: str, n_speakers: int = 0):
    """Wav layout discovery shared by Corpus.from_dir and pack.pack_corpus.

    Two layouts: flat (`data_dir/*.wav`, unlabeled) or per-speaker
    (`data_dir/<speaker>/*.wav`, sorted subdirectory names -> ids 0..S-1).
    Returns (paths, speakers | None, speaker_names | None). With
    n_speakers == 0 a per-speaker layout drops its labels with a warning
    (training proceeds unconditioned)."""
    import warnings

    def wavs_in(d: str) -> list:
        return sorted(
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.lower().endswith(".wav")
        )

    flat = wavs_in(data_dir)
    by_speaker = [
        (name, wavs)
        for name in sorted(os.listdir(data_dir))
        if os.path.isdir(os.path.join(data_dir, name))
        and (wavs := wavs_in(os.path.join(data_dir, name)))
    ]
    speakers: Optional[list] = None
    speaker_names: Optional[list] = None
    if by_speaker and flat:
        raise ValueError(
            f"{data_dir}: ambiguous layout — wav files both at the top "
            "level and inside speaker subdirectories"
        )
    if by_speaker:
        paths = [p for _, wavs in by_speaker for p in wavs]
        if n_speakers > 0:
            if len(by_speaker) > n_speakers:
                raise ValueError(
                    f"{data_dir}: {len(by_speaker)} speaker directories "
                    f"but arch.n_speakers={n_speakers}"
                )
            speakers = [
                si for si, (_, wavs) in enumerate(by_speaker)
                for _ in wavs
            ]
            speaker_names = [name for name, _ in by_speaker]
        else:
            warnings.warn(
                f"{data_dir} has speaker subdirectories but "
                "arch.n_speakers == 0; training unconditioned"
            )
    else:
        paths = flat
    if not paths:
        raise FileNotFoundError(f"No .wav files under {data_dir}")
    return paths, speakers, speaker_names


class WindowIndex:
    """Lazy flat index of (file, window) pairs: O(F) memory.

    Semantically identical to the materialized list
    [(fi, wi) for fi in files for wi in windows(fi)] — same length, same
    order, same r -> (fi, wi) mapping — but computed from per-file window-
    count prefix sums, so a 100h pack-backed corpus (~1.4M windows) costs
    kilobytes instead of hundreds of MB of tuples."""

    def __init__(self, counts):
        self.prefix = np.concatenate(
            [[0], np.cumsum(np.asarray(counts, dtype=np.int64))]
        )
        self.n = int(self.prefix[-1])

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, r: int):
        if r < 0:
            r += self.n
        if not 0 <= r < self.n:
            raise IndexError(r)
        fi = int(np.searchsorted(self.prefix, r, side="right")) - 1
        return fi, int(r - self.prefix[fi])

    def __iter__(self):
        for fi in range(len(self.prefix) - 1):
            for wi in range(int(self.prefix[fi + 1] - self.prefix[fi])):
                yield (fi, wi)


class Corpus:
    """In-memory mu-law-encoded corpus with window index."""

    def __init__(
        self,
        waves: Sequence[np.ndarray],
        arch: ArchConfig,
        window_size: int,
        speakers: Optional[Sequence[int]] = None,
        encoded: Optional[Sequence[np.ndarray]] = None,
    ):
        import jax

        self.arch = arch
        self.window_size = window_size
        self.r_field = arch.receptive_field
        self.waves = [np.asarray(w, dtype=np.float32) for w in waves]
        if encoded is not None:
            # Pre-encoded by the native ingest path (LUT — bit-identical to
            # the jnp encoder by construction; see native/__init__.py).
            self.encoded = [np.asarray(e, dtype=np.int32) for e in encoded]
            assert len(self.encoded) == len(self.waves)
        else:
            # Encode once on the CPU backend (not the session default
            # device): keeps the oracle on the SAME backend that generates
            # the native tier's LUT (native.mulaw_lut) so native-on and
            # native-off corpora are bit-identical even if an accelerator's
            # log1p differs by a ULP near a class boundary — and avoids a
            # per-file device round-trip over this image's TPU relay.
            try:
                cpu = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                cpu = None
            import contextlib

            ctx = (
                jax.default_device(cpu) if cpu is not None
                else contextlib.nullcontext()
            )
            with ctx:
                self.encoded = [
                    np.asarray(
                        mu_law_encode(
                            jax.numpy.asarray(w), arch.quant_channels
                        )
                    )
                    for w in self.waves
                ]
        self._packed: Optional[tuple] = None  # lazy (enc_concat, offsets)
        self.speakers = list(speakers) if speakers is not None else None
        self.speaker_names: Optional[list] = None  # set by from_dir
        # Flat lazy index of (file, window) pairs.
        self.index = WindowIndex(
            [
                geometry.num_windows(len(enc), window_size)
                for enc in self.encoded
            ]
        )
        if not len(self.index):
            raise ValueError("Corpus yields no training windows")

    @classmethod
    def from_dir(
        cls, data_dir: str, arch: ArchConfig, window_size: int
    ) -> "Corpus":
        """Build from a directory of wavs.

        Two layouts:
          * flat — `data_dir/*.wav`: unlabeled corpus (no global cond);
          * per-speaker — `data_dir/<speaker>/*.wav`: each sorted
            subdirectory name is one speaker, assigned ids 0..S-1
            (`corpus.speaker_names` records the mapping). Requires
            `arch.n_speakers >= S` when the arch is globally conditioned;
            with `n_speakers == 0` the labels are dropped with a warning
            (training proceeds unconditioned).

        Ingest (parse + mu-law encode) runs on the native C++ tier when
        available — multithreaded across files, LUT encode (bit-identical to
        the jnp path) — falling back per-file to scipy + jnp otherwise.
        """
        paths, speakers, speaker_names = discover_layout(
            data_dir, n_speakers=arch.n_speakers
        )

        from . import native

        results: list = [None] * len(paths)
        use_native = native.is_available()
        if use_native:
            native.mulaw_lut(arch.quant_channels)  # build once, not per-thread

            def ingest(i: int) -> None:
                with open(paths[i], "rb") as f:
                    raw = f.read()
                try:
                    results[i] = native.ingest_wav(raw, arch.quant_channels)
                except ValueError as e:  # name the offending file
                    raise ValueError(f"{paths[i]}: {e}") from e

            import concurrent.futures as cf

            workers = min(os.cpu_count() or 1, 4)
            with cf.ThreadPoolExecutor(workers) as ex:
                list(ex.map(ingest, range(len(paths))))

        waves, encoded = [], []
        any_python = False
        for p, res in zip(paths, results):
            if res is None:  # native off / non-mono / non-PCM16
                w, sr = load_wav(p)
                any_python = True
                enc = None
            else:
                w, enc, sr = res
            if sr != arch.sample_rate:
                raise ValueError(
                    f"{p}: sample rate {sr} != configured {arch.sample_rate}"
                )
            waves.append(w)
            encoded.append(enc)
        if any_python or not use_native:
            encoded = None  # jnp-encode everything
        corpus = cls(
            waves, arch, window_size, speakers=speakers, encoded=encoded
        )
        corpus.speaker_names = speaker_names
        return corpus

    @classmethod
    def from_pack(
        cls, path: str, arch: ArchConfig, window_size: int
    ) -> "Corpus":
        """Open an out-of-core packed corpus (pack.pack_corpus / `wavenet
        pack`): classes (and optionally float waves) stay ON DISK behind
        `np.memmap` views — window assembly touches only the pages a batch
        needs, so host RSS is O(batch) regardless of corpus size. Batches
        are bit-identical to the in-RAM Corpus over the same wavs
        (tests/test_pack.py). Multi-host loaders (incl. the unsharded SP
        loader) map the same file instead of each materializing the corpus.
        """
        import warnings

        from .pack import open_pack

        pk = open_pack(path)
        h = pk.header
        if h["quant_channels"] != arch.quant_channels:
            raise ValueError(
                f"{path}: pack quant_channels {h['quant_channels']} != "
                f"arch.quant_channels {arch.quant_channels}"
            )
        if h["sample_rate"] != arch.sample_rate:
            raise ValueError(
                f"{path}: pack sample_rate {h['sample_rate']} != "
                f"arch.sample_rate {arch.sample_rate}"
            )
        if arch.use_local_cond and pk.waves is None:
            raise ValueError(
                f"{path}: mel-conditioned arch needs the float waveform "
                f"section — re-pack with `wavenet pack --with-waves`"
            )
        self = cls.__new__(cls)
        self.arch = arch
        self.window_size = window_size
        self.r_field = arch.receptive_field
        off = pk.offsets
        n_files = h["n_files"]
        self.encoded = [pk.enc[off[i] : off[i + 1]] for i in range(n_files)]
        self.waves = (
            [pk.waves[off[i] : off[i + 1]] for i in range(n_files)]
            if pk.waves is not None
            else None  # non-mel packs drop the 4-byte/sample float tier
        )
        # The mmap IS the packed corpus: the native assembler reads it
        # directly (uint8 classes widened to int32 in C++).
        self._packed = (pk.enc, off)
        # Hot path: the pread-based native assembler reads window spans
        # straight from the pack FILE — unlike the mmap, whose kernel
        # fault-around inflates process RSS toward the file size, pread
        # keeps residency O(batch) (loader.cpp assemble_fd_impl).
        self._pack_fd = os.open(path, os.O_RDONLY)
        self._pack_enc_pos = pk.enc_pos
        self._pack_itemsize = np.dtype(h["enc_dtype"]).itemsize
        speakers = h.get("speakers")
        self.speaker_names = None
        if speakers is not None and arch.use_global_cond:
            if max(speakers) >= arch.n_speakers:
                raise ValueError(
                    f"{path}: pack has speaker ids up to {max(speakers)} "
                    f"but arch.n_speakers={arch.n_speakers}"
                )
            self.speakers = list(speakers)
            self.speaker_names = h.get("speaker_names")
        else:
            if speakers is not None:
                warnings.warn(
                    f"{path} carries speaker labels but arch.n_speakers "
                    "== 0; training unconditioned"
                )
            self.speakers = None
        self.index = WindowIndex(
            [
                geometry.num_windows(int(off[i + 1] - off[i]), window_size)
                for i in range(n_files)
            ]
        )
        if not len(self.index):
            raise ValueError("Corpus yields no training windows")
        return self

    def __del__(self):
        fd = getattr(self, "_pack_fd", None)
        try:
            if fd is not None:
                os.close(fd)
        except Exception:  # interpreter shutdown may have torn down os
            pass

    def example(self, fi: int, wi: int):
        inputs, targets, mask = geometry.extract_window(
            self.encoded[fi], self.window_size, self.r_field, wi
        )
        return inputs, targets, mask

    def _packed_corpus(self):
        """(enc_concat int32, offsets int64) for the native assembly path."""
        if self._packed is None:
            offsets = np.zeros(len(self.encoded) + 1, dtype=np.int64)
            np.cumsum([len(e) for e in self.encoded], out=offsets[1:])
            concat = (
                np.concatenate(self.encoded).astype(np.int32, copy=False)
                if self.encoded
                else np.zeros(0, np.int32)
            )
            self._packed = (np.ascontiguousarray(concat), offsets)
        return self._packed

    def examples_batch(self, pairs: Sequence[tuple]):
        """Batched (inputs, targets, mask) for B (file, window) pairs.

        Uses the native C++ assembler (multithreaded, GIL-free) when
        available; bit-exact vs the per-row Python path (tests/test_native).
        Pack-backed corpora read window spans with pread(2) — O(batch)
        process residency regardless of corpus size.
        """
        from . import native

        if native.is_available():
            fd = getattr(self, "_pack_fd", None)
            if fd is not None:
                out = native.assemble_windows_fd(
                    fd, self._pack_enc_pos, self._pack_itemsize,
                    self._packed[1], pairs, self.window_size, self.r_field,
                )
                if out is not None:
                    return out
            enc, offsets = self._packed_corpus()
            out = native.assemble_windows(
                enc, offsets, pairs, self.window_size, self.r_field
            )
            if out is not None:
                return out
        rows = [self.example(*p) for p in pairs]
        return (
            np.stack([r[0] for r in rows]),
            np.stack([r[1] for r in rows]),
            np.stack([r[2] for r in rows]),
        )

    def _window_segment(self, fi: int, wi: int) -> np.ndarray:
        """Float waveform over the window's model-input span (zero padded
        where the span reaches outside the file)."""
        if self.waves is None:
            raise ValueError(
                "this corpus carries no float waveforms (classes-only "
                "pack); mel extraction needs `wavenet pack --with-waves`"
            )
        t0, _ = geometry.window_bounds(
            len(self.encoded[fi]), self.window_size, wi
        )
        in_start = t0 - self.r_field
        in_len = self.r_field - 1 + self.window_size
        wav = self.waves[fi]
        lo, hi = max(in_start, 0), min(in_start + in_len, len(wav))
        seg = np.zeros(in_len, dtype=np.float32)
        seg[lo - in_start : hi - in_start] = wav[lo:hi]
        return seg

    def mel_for_windows(
        self, pairs: Sequence[tuple], n_frames: int
    ) -> np.ndarray:
        """Mel frames for a BATCH of windows in one jitted call.

        Frame k of row j corresponds to samples [in_start_j + k*hop, ...):
        the upsampled conditioning then aligns elementwise with `inputs`.
        Out-of-file regions are zero frames. Batching matters: the per-
        window eager path computed mel at 1.33M samples/sec at production
        shape — SLOWER than the 2.50M the fused mel train step consumes —
        making the input pipeline the bottleneck; one jitted batch call
        removes the per-window dispatch overhead.
        """
        arch = self.arch
        segs = np.stack([self._window_segment(fi, wi) for fi, wi in pairs])
        frames = np.asarray(_jitted_log_mel(
            arch.n_mels, arch.hop_size, arch.sample_rate
        )(segs))
        out = np.zeros((len(pairs), n_frames, arch.n_mels), dtype=np.float32)
        n = min(n_frames, frames.shape[1])
        out[:, :n] = frames[:, :n]
        return out

    def mel_for_window(self, fi: int, wi: int, n_frames: int) -> np.ndarray:
        """Single-window convenience wrapper over mel_for_windows."""
        return self.mel_for_windows([(fi, wi)], n_frames)[0]


class LaneSchedule:
    """Lane-continuous ("virtual batch") window order (SURVEY.md §2.1 [M]).

    One seeded permutation of the corpus FILES defines a circular sequence
    of all n (file, window) pairs — files in permuted order, windows in
    order within each file. The B batch lanes are B evenly staggered
    cursors on that one circle (lane k starts at (k*n)//B), each advancing
    by one window per step. Consequences:

      * lane continuity — consecutive steps of a lane are consecutive
        audio spans of one file until it is exhausted (the reference's
        virtual-batch behavior);
      * full coverage — a batch step consumes B distinct positions, and
        the union of all lanes sweeps the whole corpus every ceil(n/B)
        steps with no in-batch duplicates (for n >= B);
      * O(1) memory and O(log F) lookup — nothing is materialized; the
        pair at (lane, step) is computed from per-file window-count prefix
        sums, so the dataset cursor for exact resume is just the step.
    """

    def __init__(self, corpus: Corpus, train: TrainConfig):
        rng = np.random.default_rng(np.random.SeedSequence([train.seed, 7]))
        self.file_order = rng.permutation(len(corpus.encoded))
        counts = [
            geometry.num_windows(len(corpus.encoded[fi]), corpus.window_size)
            for fi in self.file_order
        ]
        self.prefix = np.concatenate([[0], np.cumsum(counts)])
        self.n = int(self.prefix[-1])
        self.batch_size = train.batch_size

    def pair(self, lane: int, step: int) -> tuple:
        """(file, window) for `lane` at `step`."""
        pos = (lane * self.n // self.batch_size + step) % self.n
        j = int(np.searchsorted(self.prefix, pos, side="right")) - 1
        return int(self.file_order[j]), int(pos - self.prefix[j])


def load_corpus(path: str, arch: ArchConfig, window_size: int) -> Corpus:
    """Corpus from a path: a directory of wavs (in-RAM ingest) or a packed
    corpus FILE (out-of-core mmap; pack.pack_corpus / `wavenet pack`)."""
    if os.path.isfile(path):
        return Corpus.from_pack(path, arch, window_size)
    return Corpus.from_dir(path, arch, window_size)


def make_batches(
    corpus: Corpus,
    train: TrainConfig,
    host_id: int = 0,
    host_count: int = 1,
    start_step: int = 0,
    with_mel: bool = False,
) -> Iterator[Batch]:
    """Infinite deterministic batch stream; host takes rows host_id::host_count.

    Default mode: each epoch is a seeded permutation of all windows (i.i.d.
    sampling without replacement). With train.lane_continuous, each lane
    walks files sequentially instead (the reference's virtual-batch
    continuity; see lane_schedule). In both modes batch b of the run is the
    same global set of windows for any host topology, and `start_step`
    supports exact resume (the dataset cursor is just the step count).
    """
    if train.batch_size % host_count:
        raise ValueError("global batch size must divide evenly across hosts")
    per_host = train.batch_size // host_count
    n = len(corpus.index)
    arch = corpus.arch
    in_len = corpus.r_field - 1 + corpus.window_size
    n_frames = -(-in_len // arch.hop_size) if with_mel else 0
    lanes = (
        LaneSchedule(corpus, train)
        if getattr(train, "lane_continuous", False)
        else None
    )

    step = start_step
    perms: dict[int, np.ndarray] = {}  # epoch -> permutation (<= 2 live)

    def perm_for(epoch: int) -> np.ndarray:
        p = perms.get(epoch)
        if p is None:
            rng = np.random.default_rng(
                np.random.SeedSequence([train.seed, epoch])
            )
            p = perms[epoch] = rng.permutation(n)
            for e in [e for e in perms if e < epoch - 1]:
                del perms[e]  # keep at most the seam's two epochs
        return p

    while True:
        if lanes is not None:
            pairs = [
                lanes.pair(k, step) for k in range(train.batch_size)
            ][host_id::host_count]
        else:
            # Per-ROW epoch: global position g = step*B + k draws
            # perm_{g//n}[g % n]. A batch spanning an epoch boundary takes
            # its tail rows from the NEXT epoch's permutation head instead
            # of wrapping into the current epoch (which repeated
            # already-consumed windows and skipped the next permutation's
            # head) — every window appears exactly once per epoch even when
            # n % batch_size != 0. Non-seam batches are unchanged.
            base = step * train.batch_size
            picks = [
                perm_for((base + k) // n)[(base + k) % n]
                for k in range(train.batch_size)
            ]
            pairs = [corpus.index[r] for r in picks[host_id::host_count]]
        assert len(pairs) == per_host
        inputs, targets, mask = corpus.examples_batch(pairs)
        mel = None
        if with_mel:
            mel = corpus.mel_for_windows(pairs, n_frames)
        speaker = None
        if corpus.speakers is not None:
            speaker = np.asarray(
                [corpus.speakers[p[0]] for p in pairs], dtype=np.int32
            )
        yield Batch(inputs, targets, mask, mel, speaker)
        step += 1


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Run `iterator` in a daemon thread, keeping `depth` items ready.

    Overlaps host-side batch construction (windowing, mel extraction) with
    device steps — the input-pipeline half of SURVEY.md §5's determinism
    story is unchanged (the underlying iterator is still the seeded,
    deterministic make_batches stream; this only shifts WHEN items are
    computed).
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except Exception as e:  # surface errors on the consumer side
            q.put(e)
        q.put(stop)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is stop:
            return
        if isinstance(item, Exception):
            raise item
        yield item


def synthetic_corpus(
    arch: ArchConfig,
    window_size: int,
    n_files: int = 4,
    file_len: int = 16000,
    seed: int = 0,
) -> Corpus:
    """Deterministic synthetic corpus (mixed sinusoids + noise) for tests/bench."""
    rng = np.random.default_rng(seed)
    waves = []
    for _ in range(n_files):
        t = np.arange(file_len, dtype=np.float32) / arch.sample_rate
        f0 = rng.uniform(80, 400)
        w = (
            0.5 * np.sin(2 * np.pi * f0 * t)
            + 0.2 * np.sin(2 * np.pi * 2.7 * f0 * t)
            + 0.05 * rng.standard_normal(file_len)
        )
        waves.append(np.clip(w, -1, 1).astype(np.float32))
    return Corpus(waves, arch, window_size)
