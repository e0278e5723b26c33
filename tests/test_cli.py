"""CLI surface smoke tests (reference parity: train/generate entry points)."""
import json
import os
import subprocess
import sys


def _run(args, **kw):
    env = dict(os.environ, WAVENET_PLATFORM="cpu")
    return subprocess.run(
        [sys.executable, "-m", "lb_wavenet_tpu.cli", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)),
        **kw,
    )


def test_cli_rejects_bad_override():
    out = _run(["train", "--set", "nonsense"], timeout=120)
    assert out.returncode != 0
    assert "section.key=value" in out.stderr


def test_cli_train_generate_roundtrip(tmp_path):
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    for i in range(2):
        write_wav(str(data / f"{i}.wav"), 0.4 * np.sin(2 * np.pi * (120 + 60 * i) * t), 16000)

    ckpt, outdir = tmp_path / "ck", tmp_path / "out"
    r = _run(
        [
            "train",
            "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=3",
            "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
            "--set", "arch.gate_channels=8", "--set", 'arch.compute_dtype="float32"',
            "--set", f'train.data_dir="{data}"', "--set", "train.n_steps=4",
            "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
            "--set", "train.window_size=64", "--set", "train.log_every=2",
            "--set", "train.checkpoint_every=4",
            "--set", f'train.checkpoint_dir="{ckpt}"',
        ],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert any(line.startswith("{") for line in r.stdout.splitlines())

    r = _run(
        [
            "generate",
            "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=3",
            "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
            "--set", "arch.gate_channels=8", "--set", 'arch.compute_dtype="float32"',
            "--set", f'gen.checkpoint_dir="{ckpt}"', "--set", "gen.batch_size=2",
            "--set", "gen.n_samples=64", "--set", f'gen.out_dir="{outdir}"',
        ],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert sorted(os.listdir(outdir)) == ["gen_0000.wav", "gen_0001.wav"]


def test_cli_info():
    """`wavenet info`: geometry + param count + roofline, no checkpoint."""
    r = _run(["info", "--config", "configs/wavenet30.json"], timeout=180)
    assert r.returncode == 0, r.stdout + r.stderr
    rec = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert rec["layers"] == 30
    assert rec["receptive_field"] == 1 + 1 + 3 * (2**10 - 1)
    assert rec["n_params"] > 0
    assert rec["ar_speed_of_light"]["sol_audio_sec_per_sec"] > 0


def test_cli_export(tmp_path):
    """`wavenet export`: writes a loadable AOT serving artifact."""
    out = tmp_path / "artifact"
    r = _run(
        [
            "export",
            "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=3",
            "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
            "--set", "arch.gate_channels=8", "--set", 'arch.compute_dtype="float32"',
            "--out", str(out), "--engine", "xla", "--batch", "2", "--chunk", "16",
        ],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    rec = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert rec["batch"] == 2 and rec["chunk_size"] == 16
    assert sorted(os.listdir(out)) == [
        "init.jaxexport", "manifest.json", "reset.jaxexport",
        "step.jaxexport",
    ]


def test_cli_generate_from_artifact(tmp_path):
    """train -> export -> generate --artifact: the AOT serving loop."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    write_wav(str(data / "a.wav"), 0.4 * np.sin(2 * np.pi * 150 * t), 16000)

    arch_args = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=3",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8", "--set", 'arch.compute_dtype="float32"',
    ]
    ckpt, art, outdir = tmp_path / "ck", tmp_path / "art", tmp_path / "out"
    r = _run(
        ["train", *arch_args,
         "--set", f'train.data_dir="{data}"', "--set", "train.n_steps=2",
         "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
         "--set", "train.window_size=64", "--set", "train.checkpoint_every=2",
         "--set", f'train.checkpoint_dir="{ckpt}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    r = _run(
        ["export", *arch_args, "--out", str(art), "--engine", "xla",
         "--batch", "2", "--chunk", "16"],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    r = _run(
        ["generate", *arch_args, "--artifact", str(art),
         "--set", f'gen.checkpoint_dir="{ckpt}"',
         "--set", "gen.n_samples=40", "--set", f'gen.out_dir="{outdir}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    rec = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert rec["artifact"] == str(art) and rec["n_samples"] == 40
    assert sorted(os.listdir(outdir)) == ["gen_0000.wav", "gen_0001.wav"]


def test_cli_generate_from_mel_artifact_bf16(tmp_path):
    """Mel-conditioned artifact at the DEFAULT compute dtype (bfloat16):
    the exported step pins the cond input to bf16 while the host chunk
    buffer is float32 — regression for the dtype-mismatch crash."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    write_wav(str(data / "a.wav"), 0.4 * np.sin(2 * np.pi * 180 * t), 16000)

    arch_args = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=3",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8", "--set", "arch.n_mels=8",
        "--set", "arch.cond_channels=8", "--set", "arch.upsample_factors=[2,4]",
    ]  # compute_dtype stays the default bfloat16
    ckpt, art, outdir = tmp_path / "ck", tmp_path / "art", tmp_path / "out"
    r = _run(
        ["train", *arch_args,
         "--set", f'train.data_dir="{data}"', "--set", "train.n_steps=2",
         "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
         "--set", "train.window_size=64", "--set", "train.checkpoint_every=2",
         "--set", f'train.checkpoint_dir="{ckpt}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    r = _run(
        ["export", *arch_args, "--out", str(art), "--engine", "xla",
         "--batch", "2", "--chunk", "16"],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    mel = tmp_path / "frames.npy"
    np.save(mel, np.random.default_rng(0).standard_normal(
        (2, 8, 8)).astype(np.float32))  # 8 frames x hop 8 = 64 samples
    r = _run(
        ["generate", *arch_args, "--artifact", str(art), "--mel", str(mel),
         "--set", f'gen.checkpoint_dir="{ckpt}"',
         "--set", "gen.n_samples=32", "--set", f'gen.out_dir="{outdir}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert sorted(os.listdir(outdir)) == ["gen_0000.wav", "gen_0001.wav"]


def test_cli_eval(tmp_path):
    """`wavenet eval`: held-out metrics from a trained checkpoint."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    write_wav(str(data / "a.wav"), 0.4 * np.sin(2 * np.pi * 150 * t), 16000)

    tiny = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=3",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8", "--set", 'arch.compute_dtype="float32"',
    ]
    ckpt = tmp_path / "ck"
    r = _run(
        ["train", *tiny,
         "--set", f'train.data_dir="{data}"', "--set", "train.n_steps=2",
         "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
         "--set", "train.window_size=64", "--set", "train.checkpoint_every=2",
         "--set", f'train.checkpoint_dir="{ckpt}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    r = _run(
        ["eval", *tiny, "--data-dir", str(data),
         "--set", f'gen.checkpoint_dir="{ckpt}"',
         "--set", "train.batch_size=2", "--set", "train.window_size=64"],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    rec = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert np.isfinite(rec["nll"]) and rec["n_samples"] > 0
    assert rec["bits_per_sample"] <= 8.5  # near-uniform softmax after 2 steps


def test_cli_generate_streaming(tmp_path):
    """--stream-chunk: incremental emission; output files + progress lines."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    write_wav(str(data / "a.wav"), 0.4 * np.sin(2 * np.pi * 150 * t), 16000)

    tiny = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=3",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8", "--set", 'arch.compute_dtype="float32"',
    ]
    ckpt, outdir = tmp_path / "ck", tmp_path / "out"
    r = _run(
        ["train", *tiny,
         "--set", f'train.data_dir="{data}"', "--set", "train.n_steps=2",
         "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
         "--set", "train.window_size=64", "--set", "train.checkpoint_every=2",
         "--set", f'train.checkpoint_dir="{ckpt}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    r = _run(
        ["generate", *tiny, "--stream-chunk", "16",
         "--set", f'gen.checkpoint_dir="{ckpt}"', "--set", "gen.batch_size=2",
         "--set", "gen.n_samples=48", "--set", f'gen.out_dir="{outdir}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    progress = [json.loads(l) for l in r.stdout.splitlines()
                if l.startswith("{") and "streamed_samples" in l]
    assert [p["streamed_samples"] for p in progress] == [16, 32, 48]
    assert sorted(os.listdir(outdir)) == ["gen_0000.wav", "gen_0001.wav"]


def test_cli_streamed_mel_matches_one_shot(tmp_path):
    """--stream-chunk --mel (streaming vocoder mode) writes byte-identical
    wavs to the one-shot mel path: same seed, same engine, chunked cond via
    the StreamingUpsampler."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    write_wav(str(data / "a.wav"), 0.4 * np.sin(2 * np.pi * 150 * t), 16000)

    tiny = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=3",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8", "--set", 'arch.compute_dtype="float32"',
        "--set", "arch.n_mels=8", "--set", "arch.cond_channels=8",
        "--set", "arch.upsample_factors=[4,4]",
    ]
    ckpt = tmp_path / "ck"
    r = _run(
        ["train", *tiny,
         "--set", f'train.data_dir="{data}"', "--set", "train.n_steps=2",
         "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
         "--set", "train.window_size=64", "--set", "train.checkpoint_every=2",
         "--set", f'train.checkpoint_dir="{ckpt}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    frames = np.random.default_rng(5).standard_normal((2, 8, 8)).astype(
        np.float32
    )
    mel_path = str(tmp_path / "frames.npy")
    np.save(mel_path, frames)

    gen = [
        "--set", f'gen.checkpoint_dir="{ckpt}"', "--set", "gen.batch_size=2",
        "--set", "gen.n_samples=96", "--mel", mel_path,
    ]
    out_a, out_b = tmp_path / "one_shot", tmp_path / "streamed"
    r = _run(
        ["generate", *tiny, *gen, "--set", f'gen.out_dir="{out_a}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    r = _run(
        ["generate", *tiny, *gen, "--stream-chunk", "32",
         "--set", f'gen.out_dir="{out_b}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    for name in sorted(os.listdir(out_a)):
        a = open(out_a / name, "rb").read()
        b = open(out_b / name, "rb").read()
        assert a == b, f"{name}: streamed mel wav differs from one-shot"


def test_cli_generate_streaming_mega(tmp_path):
    """--stream-chunk with gen.engine=mega streams via the whole-chunk
    kernel (batch % 128 == 0)."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    write_wav(str(data / "a.wav"), 0.4 * np.sin(2 * np.pi * 150 * t), 16000)

    tiny = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=2",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8", "--set", 'arch.compute_dtype="float32"',
    ]
    ckpt, outdir = tmp_path / "ck", tmp_path / "out"
    r = _run(
        ["train", *tiny,
         "--set", f'train.data_dir="{data}"', "--set", "train.n_steps=2",
         "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
         "--set", "train.window_size=64", "--set", "train.checkpoint_every=2",
         "--set", f'train.checkpoint_dir="{ckpt}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    r = _run(
        ["generate", *tiny, "--stream-chunk", "8",
         "--set", 'gen.engine="mega"',
         "--set", f'gen.checkpoint_dir="{ckpt}"', "--set", "gen.batch_size=128",
         "--set", "gen.n_samples=16", "--set", f'gen.out_dir="{outdir}"'],
        timeout=400,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "notice" not in r.stdout  # no fallback: mega really streamed
    assert len(os.listdir(outdir)) == 128


def test_cli_serve(tmp_path):
    """wavenet serve: continuous-batching JSONL request server — variable
    lengths, more requests than lanes (lane recycling), per-request wavs."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    write_wav(str(data / "a.wav"), 0.4 * np.sin(2 * np.pi * 150 * t), 16000)

    tiny = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=2",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8", "--set", 'arch.compute_dtype="float32"',
    ]
    ckpt, outdir = tmp_path / "ck", tmp_path / "out"
    r = _run(
        ["train", *tiny,
         "--set", f'train.data_dir="{data}"', "--set", "train.n_steps=2",
         "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
         "--set", "train.window_size=64", "--set", "train.checkpoint_every=2",
         "--set", f'train.checkpoint_dir="{ckpt}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    reqs = tmp_path / "requests.jsonl"
    lengths = {"alpha": 40, "beta": 17, "gamma/../x": 25}  # id sanitized
    reqs.write_text("".join(
        json.dumps({"id": rid, "n_samples": n}) + "\n"
        for rid, n in lengths.items()
    ))
    # batch 2 lanes < 3 requests -> the third lands on a recycled lane.
    r = _run(
        ["serve", *tiny, "--requests", str(reqs), "--stream-chunk", "8",
         "--set", f'gen.checkpoint_dir="{ckpt}"', "--set", "gen.batch_size=2",
         "--set", f'gen.out_dir="{outdir}"'],
        timeout=400,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    summary = lines[-1]
    assert summary["served"] == 3
    done = {rec["done"]: rec for rec in lines[:-1] if "done" in rec}
    assert set(done) == set(lengths)
    import scipy.io.wavfile as wavfile

    assert sorted(os.listdir(outdir)) == ["alpha.wav", "beta.wav",
                                          "gamma_.._x.wav"]
    for rid, n in lengths.items():
        sr, wav = wavfile.read(done[rid]["wav"])
        assert (sr, len(wav)) == (16000, n)

    # duplicate ids rejected
    reqs.write_text('{"id": "a", "n_samples": 8}\n{"id": "a", "n_samples": 8}\n')
    r = _run(["serve", *tiny, "--requests", str(reqs),
              "--set", f'gen.checkpoint_dir="{ckpt}"',
              "--set", f'gen.out_dir="{outdir}"'], timeout=300)
    assert r.returncode != 0 and "duplicate id" in r.stderr

    # distinct raw ids that sanitize to the same wav filename rejected
    # (would silently overwrite each other's output otherwise)
    reqs.write_text('{"id": "a/b", "n_samples": 8}\n{"id": "a_b", "n_samples": 8}\n')
    r = _run(["serve", *tiny, "--requests", str(reqs),
              "--set", f'gen.checkpoint_dir="{ckpt}"',
              "--set", f'gen.out_dir="{outdir}"'], timeout=300)
    assert r.returncode != 0 and "sanitization" in r.stderr


def test_cli_serve_mesh_model(tmp_path):
    """r4 (VERDICT r3 item 5): `wavenet serve --mesh-model N` serves a
    MODEL-SHARDED pool (skip-split TP sessions under shard_map) end to end
    — request wavs written, length-exact, lane recycling across the mesh."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    write_wav(str(data / "a.wav"), 0.4 * np.sin(2 * np.pi * 150 * t), 16000)

    tiny = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=2",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8", "--set", 'arch.compute_dtype="float32"',
    ]
    ckpt, outdir = tmp_path / "ck", tmp_path / "out"
    r = _run(
        ["train", *tiny,
         "--set", f'train.data_dir="{data}"', "--set", "train.n_steps=2",
         "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
         "--set", "train.window_size=64", "--set", "train.checkpoint_every=2",
         "--set", f'train.checkpoint_dir="{ckpt}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    reqs = tmp_path / "requests.jsonl"
    lengths = {"one": 24, "two": 17, "three": 9}
    reqs.write_text("".join(
        json.dumps({"id": rid, "n_samples": n}) + "\n"
        for rid, n in lengths.items()
    ))
    # 2 lanes x (data=2, model=4) mesh: lane recycling + skip-split TP;
    # --deliver request exercises the device-ring accumulation path (r4)
    # through the CLI in the same pass.
    r = _run(
        ["serve", *tiny, "--requests", str(reqs), "--stream-chunk", "8",
         "--mesh-model", "4", "--deliver", "request",
         "--set", f'gen.checkpoint_dir="{ckpt}"', "--set", "gen.batch_size=2",
         "--set", f'gen.out_dir="{outdir}"'],
        timeout=400,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    assert lines[-1]["served"] == 3
    import scipy.io.wavfile as wavfile

    for rid, n in lengths.items():
        sr, wav = wavfile.read(str(outdir / f"{rid}.wav"))
        assert (sr, len(wav)) == (16000, n)
        assert np.isfinite(wav).all()


def test_cli_generate_fleet_and_model_sharded(tmp_path):
    """Mesh synthesis through the CLI: --fleet shards the batch over the 8
    virtual devices and --mesh-model shards the channels; both write the
    SAME wavs as the plain single-device run (greedy, xla engine)."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    for i in range(2):
        write_wav(str(data / f"{i}.wav"),
                  0.4 * np.sin(2 * np.pi * (120 + 60 * i) * t), 16000)

    arch = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=3",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8",
        "--set", 'arch.compute_dtype="float32"',
    ]
    ckpt = tmp_path / "ck"
    r = _run(
        ["train", *arch,
         "--set", f'train.data_dir="{data}"', "--set", "train.n_steps=2",
         "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
         "--set", "train.window_size=64", "--set", "train.checkpoint_every=2",
         "--set", f'train.checkpoint_dir="{ckpt}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    def gen(outdir, *extra):
        r = _run(
            ["generate", *arch,
             "--set", f'gen.checkpoint_dir="{ckpt}"',
             "--set", "gen.batch_size=8", "--set", "gen.n_samples=32",
             "--set", "gen.temperature=0.0", "--set", 'gen.engine="xla"',
             "--set", f'gen.out_dir="{outdir}"', *extra],
            timeout=300,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        return {
            f: open(os.path.join(outdir, f), "rb").read()
            for f in sorted(os.listdir(outdir))
        }

    ref = gen(tmp_path / "ref")
    fleet = gen(tmp_path / "fleet", "--fleet")
    assert fleet == ref
    ms = gen(tmp_path / "ms", "--fleet", "--mesh-model", "2")
    assert ms == ref
    # Kernel-speed TP (r3): --mesh-model with the pallas engine rides the
    # shard_map skip-split path; greedy output identical.
    tp = gen(tmp_path / "tp", "--fleet", "--mesh-model", "2",
             "--set", 'gen.engine="pallas"')
    assert tp == ref


def test_cli_streaming_mega_auto_pads_odd_batch(tmp_path, monkeypatch):
    """mega streaming at a non-multiple batch auto-pads the device session
    (WAVENET_MEGA_PAD_TEST=4 stands in for TPU's 128) and writes exactly
    gen.batch_size wavs."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    monkeypatch.setenv("WAVENET_MEGA_PAD_TEST", "4")
    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    write_wav(str(data / "a.wav"), 0.4 * np.sin(2 * np.pi * 150 * t), 16000)

    tiny = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=2",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8",
        "--set", 'arch.compute_dtype="float32"',
    ]
    ckpt, outdir = tmp_path / "ck", tmp_path / "out"
    r = _run(
        ["train", *tiny,
         "--set", f'train.data_dir="{data}"', "--set", "train.n_steps=2",
         "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
         "--set", "train.window_size=64", "--set", "train.checkpoint_every=2",
         "--set", f'train.checkpoint_dir="{ckpt}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    r = _run(
        ["generate", *tiny, "--stream-chunk", "8",
         "--set", 'gen.engine="mega"',
         "--set", f'gen.checkpoint_dir="{ckpt}"', "--set", "gen.batch_size=3",
         "--set", "gen.n_samples=16", "--set", f'gen.out_dir="{outdir}"'],
        timeout=400,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert '"padded_session_batch": 4' in r.stdout
    assert len(os.listdir(outdir)) == 3


def test_cli_warm_precompiles(tmp_path):
    """wavenet warm: AOT lower+compile of the configured executables into
    the persistent cache — no data, no checkpoint, cache entries written."""
    env_cache = tmp_path / "jaxcache"
    import subprocess as sp

    env = dict(os.environ, WAVENET_PLATFORM="cpu",
               WAVENET_COMPILE_CACHE=str(env_cache))
    tiny = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=3",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8",
        "--set", 'arch.compute_dtype="float32"',
        "--set", "train.batch_size=2", "--set", "train.window_size=32",
        "--set", "gen.batch_size=2", "--set", "gen.n_samples=16",
    ]
    r = sp.run(
        [sys.executable, "-m", "lb_wavenet_tpu.cli", "warm", *tiny,
         "--stream-chunk", "8"],
        capture_output=True, text=True, env=env, timeout=300,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert r.returncode == 0, r.stdout + r.stderr
    out = json.loads(r.stdout.splitlines()[-1])
    targets = {w["target"] for w in out["warmed"]}
    # gen.engine unset: the stream-chunk target warms BOTH consumers'
    # defaults — `wavenet serve` (mega) and `generate --stream-chunk` (xla)
    # — so a serve cold-start is a cache hit too (ADVICE r2).
    assert targets == {
        "train_step", "generate[xla]",
        "stream_chunk[mega]x8", "stream_chunk[xla]x8",
    }
    assert env_cache.exists() and len(os.listdir(env_cache)) >= 1


def test_cli_serve_mel_conditioned_with_seed_replay(tmp_path):
    """VERDICT r2 item 4: `wavenet serve` drives a mel-conditioned arch end
    to end (per-request "mel" npy through SessionPool's cond_fn), logs each
    request's per-lane sampling seed, and a request replayed with that seed
    on a DIFFERENT pool (other batch width, fresh process) reproduces the
    wav bit-for-bit."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    write_wav(str(data / "a.wav"), 0.4 * np.sin(2 * np.pi * 200 * t), 16000)

    tiny = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=2",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8", "--set", "arch.n_mels=4",
        "--set", "arch.cond_channels=8", "--set", "arch.upsample_factors=[4]",
        "--set", 'arch.compute_dtype="float32"',
    ]
    ckpt, outdir = tmp_path / "ck", tmp_path / "out"
    r = _run(
        ["train", *tiny,
         "--set", f'train.data_dir="{data}"', "--set", "train.n_steps=2",
         "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
         "--set", "train.window_size=64", "--set", "train.checkpoint_every=2",
         "--set", f'train.checkpoint_dir="{ckpt}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    rng = np.random.default_rng(0)
    mels = {}
    for rid, n in (("alpha", 40), ("beta", 24)):
        frames = rng.standard_normal((n // 4 + 2, 4)).astype(np.float32)
        path = tmp_path / f"{rid}.npy"
        np.save(path, frames)
        mels[rid] = (n, str(path))
    reqs = tmp_path / "requests.jsonl"
    reqs.write_text(
        json.dumps({"id": "alpha", "n_samples": 40,
                    "mel": mels["alpha"][1], "seed": 777}) + "\n"
        + json.dumps({"id": "beta", "n_samples": 24,
                      "mel": mels["beta"][1]}) + "\n"
    )
    r = _run(
        ["serve", *tiny, "--requests", str(reqs), "--stream-chunk", "8",
         "--set", f'gen.checkpoint_dir="{ckpt}"', "--set", "gen.batch_size=2",
         "--set", f'gen.out_dir="{outdir}"'],
        timeout=400,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    lines = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    done = {rec["done"]: rec for rec in lines[:-1] if "done" in rec}
    assert done["alpha"]["seed"] == 777
    assert isinstance(done["beta"]["seed"], int)  # derived seed is logged
    assert lines[-1]["served"] == 2

    # Replay alpha alone on a 1-lane pool with the logged seed: bit-equal.
    reqs2 = tmp_path / "replay.jsonl"
    reqs2.write_text(json.dumps(
        {"id": "alpha", "n_samples": 40, "mel": mels["alpha"][1],
         "seed": 777}) + "\n")
    out2 = tmp_path / "out2"
    r = _run(
        ["serve", *tiny, "--requests", str(reqs2), "--stream-chunk", "8",
         "--set", f'gen.checkpoint_dir="{ckpt}"', "--set", "gen.batch_size=1",
         "--set", f'gen.out_dir="{out2}"'],
        timeout=400,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    a = (outdir / "alpha.wav").read_bytes()
    b = (out2 / "alpha.wav").read_bytes()
    assert a == b

    # Missing mel on a mel arch is rejected with a clear message.
    reqs3 = tmp_path / "bad.jsonl"
    reqs3.write_text('{"id": "x", "n_samples": 8}\n')
    r = _run(["serve", *tiny, "--requests", str(reqs3),
              "--set", f'gen.checkpoint_dir="{ckpt}"',
              "--set", f'gen.out_dir="{outdir}"'], timeout=300)
    assert r.returncode != 0 and "mel" in r.stderr


def test_cli_pack_then_train_from_pack(tmp_path):
    """`wavenet pack` writes the out-of-core corpus; `wavenet train` points
    train.data_dir at the pack FILE and trains from the mmap/pread tier."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    for i in range(2):
        write_wav(
            str(data / f"{i}.wav"),
            0.4 * np.sin(2 * np.pi * (120 + 60 * i) * t), 16000,
        )
    pack = tmp_path / "corpus.pack"
    arch_sets = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=3",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8",
        "--set", 'arch.compute_dtype="float32"',
    ]
    r = _run(
        ["pack", *arch_sets, "--data-dir", str(data), "--out", str(pack)],
        timeout=300,
    )
    assert r.returncode == 0, r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["n_files"] == 2 and rec["enc_dtype"] == "uint8"
    assert rec["n_samples"] == 12000

    ckpt = tmp_path / "ck"
    r = _run(
        [
            "train", *arch_sets,
            "--set", f'train.data_dir="{pack}"', "--set", "train.n_steps=2",
            "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
            "--set", "train.window_size=64", "--set", "train.log_every=1",
            "--set", "train.checkpoint_every=2",
            "--set", f'train.checkpoint_dir="{ckpt}"',
        ],
        timeout=600,
    )
    assert r.returncode == 0, r.stderr
    lines = [json.loads(x) for x in r.stdout.strip().splitlines() if x.startswith("{")]
    assert any("loss" in rec for rec in lines)


def test_cli_serve_listen_online_daemon(tmp_path):
    """`wavenet serve --listen` (r5): online HTTP daemon — train a tiny
    checkpoint, start the server on an ephemeral port, POST /synthesize
    (classes format, pinned seed), check /healthz, then SIGINT-stop."""
    import signal
    import urllib.request

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    write_wav(str(data / "a.wav"), 0.4 * np.sin(2 * np.pi * 150 * t), 16000)

    tiny = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=2",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8",
        "--set", 'arch.compute_dtype="float32"',
    ]
    ckpt = tmp_path / "ck"
    r = _run(
        ["train", *tiny,
         "--set", f'train.data_dir="{data}"', "--set", "train.n_steps=2",
         "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
         "--set", "train.window_size=64", "--set", "train.checkpoint_every=2",
         "--set", f'train.checkpoint_dir="{ckpt}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    env = dict(os.environ, WAVENET_PLATFORM="cpu")
    p = subprocess.Popen(
        [sys.executable, "-m", "lb_wavenet_tpu.cli",
         "serve", *tiny, "--listen", "127.0.0.1:0", "--stream-chunk", "8",
         "--set", f'gen.checkpoint_dir="{ckpt}"', "--set", "gen.batch_size=2"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    try:
        line = p.stdout.readline()  # flushed "listening" banner
        banner = json.loads(line)
        url = "http://" + banner["listening"]
        req = urllib.request.Request(
            url + "/synthesize",
            data=json.dumps({"n_samples": 20, "seed": 9,
                             "format": "classes"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert len(out["classes"]) == 20
        assert all(0 <= c < 256 for c in out["classes"])
        with urllib.request.urlopen(url + "/healthz", timeout=30) as resp:
            h = json.loads(resp.read())
        assert h["ok"] and h["batch"] == 2
    finally:
        p.send_signal(signal.SIGINT)  # exact PID we started — never pkill
        try:
            p.wait(timeout=60)
        except subprocess.TimeoutExpired:
            p.terminate()
            p.wait(timeout=30)
    assert p.returncode == 0, p.stderr.read()


def test_cli_export_per_lane_then_serve_artifact(tmp_path):
    """r5: `wavenet export --per-lane` -> `wavenet serve --artifact` —
    frozen-artifact pool serving with per-request seed/temperature; wavs
    equal the checkpoint-traced serve of the same requests."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    write_wav(str(data / "a.wav"), 0.4 * np.sin(2 * np.pi * 150 * t), 16000)

    tiny = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=2",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8",
        "--set", 'arch.compute_dtype="float32"',
    ]
    ckpt = tmp_path / "ck"
    r = _run(
        ["train", *tiny,
         "--set", f'train.data_dir="{data}"', "--set", "train.n_steps=2",
         "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
         "--set", "train.window_size=64", "--set", "train.checkpoint_every=2",
         "--set", f'train.checkpoint_dir="{ckpt}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    artdir = tmp_path / "art"
    r = _run(
        ["export", *tiny, "--out", str(artdir), "--engine", "xla",
         "--batch", "2", "--chunk", "8", "--per-lane"],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert json.loads(r.stdout.strip().splitlines()[-1])["per_lane"] is True

    reqs = tmp_path / "requests.jsonl"
    reqs.write_text("".join(json.dumps(x) + "\n" for x in [
        {"id": "p", "n_samples": 20, "seed": 5},
        {"id": "q", "n_samples": 11, "seed": 6, "temperature": 0.7},
        {"id": "g", "n_samples": 9, "seed": 7, "temperature": 0.0},
    ]))

    out_art, out_ref = tmp_path / "out_art", tmp_path / "out_ref"
    r = _run(
        ["serve", *tiny, "--artifact", str(artdir),
         "--requests", str(reqs),
         "--set", f'gen.checkpoint_dir="{ckpt}"',
         "--set", "gen.batch_size=2", "--set", 'gen.engine="xla"',
         "--set", f'gen.out_dir="{out_art}"'],
        timeout=400,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    r = _run(
        ["serve", *tiny, "--requests", str(reqs), "--stream-chunk", "8",
         "--set", f'gen.checkpoint_dir="{ckpt}"',
         "--set", "gen.batch_size=2", "--set", 'gen.engine="xla"',
         "--set", f'gen.out_dir="{out_ref}"'],
        timeout=400,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    from scipy.io import wavfile
    for rid in ("p", "q", "g"):
        _, wa = wavfile.read(str(out_art / f"{rid}.wav"))
        _, wr = wavfile.read(str(out_ref / f"{rid}.wav"))
        np.testing.assert_array_equal(wa, wr)


def test_cli_serve_artifact_listen_composition(tmp_path):
    """`wavenet serve --artifact DIR --listen` — frozen-artifact pool
    behind the online HTTP daemon."""
    import signal
    import urllib.request

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from lb_wavenet_tpu.data import write_wav

    data = tmp_path / "data"
    data.mkdir()
    t = np.arange(6000) / 16000
    write_wav(str(data / "a.wav"), 0.4 * np.sin(2 * np.pi * 150 * t), 16000)

    tiny = [
        "--set", "arch.n_blocks=1", "--set", "arch.n_layers_per_block=2",
        "--set", "arch.residual_channels=8", "--set", "arch.skip_channels=8",
        "--set", "arch.gate_channels=8",
        "--set", 'arch.compute_dtype="float32"',
    ]
    ckpt = tmp_path / "ck"
    r = _run(
        ["train", *tiny,
         "--set", f'train.data_dir="{data}"', "--set", "train.n_steps=2",
         "--set", "train.batch_size=2", "--set", "train.mesh_data=1",
         "--set", "train.window_size=64", "--set", "train.checkpoint_every=2",
         "--set", f'train.checkpoint_dir="{ckpt}"'],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    artdir = tmp_path / "art"
    r = _run(
        ["export", *tiny, "--out", str(artdir), "--engine", "xla",
         "--batch", "2", "--chunk", "8", "--per-lane"],
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    env = dict(os.environ, WAVENET_PLATFORM="cpu")
    p = subprocess.Popen(
        [sys.executable, "-m", "lb_wavenet_tpu.cli",
         "serve", *tiny, "--artifact", str(artdir),
         "--listen", "127.0.0.1:0",
         "--set", f'gen.checkpoint_dir="{ckpt}"',
         "--set", "gen.batch_size=2", "--set", 'gen.engine="xla"'],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    try:
        banner = json.loads(p.stdout.readline())
        url = "http://" + banner["listening"]
        req = urllib.request.Request(
            url + "/synthesize",
            data=json.dumps({"n_samples": 12, "seed": 3,
                             "temperature": 0.7,
                             "format": "classes"}).encode(),
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert len(out["classes"]) == 12
    finally:
        p.send_signal(signal.SIGINT)  # exact PID we started — never pkill
        try:
            p.wait(timeout=60)
        except subprocess.TimeoutExpired:
            p.terminate()
            p.wait(timeout=30)
    assert p.returncode == 0, p.stderr.read()
