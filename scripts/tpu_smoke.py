"""Full-surface CLI smoke on the REAL device: run every subcommand serially.

Each case is a bounded subprocess of ``python3 -m pyaudiorestoration_tpu``
on tiny fixtures, executed one at a time (concurrent TPU clients can wedge
the relay).  Motivation: device-only failure modes hide in paths the test
suite (CPU mesh) cannot see — e.g. the streamed heal downloaded a COMPLEX
spectrogram, which is UNIMPLEMENTED on the axon relay; only a real-device
drive of that exact CLI flag caught it.  Reference surface inventory:
the tool scripts at the reference root (pyrespeeder_gui.py etc.).

Writes one JSON report (default docs/TPU_SMOKE_r05.json) and exits 2 if
any case fails.  ~10-25 min warm depending on the relay.
"""
import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("AUDIOIO_NO_IDX", "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SAMPLES = "/root/reference/samples"


def make_fixtures(d):
    import numpy as np

    sys.path.insert(0, REPO)
    from pyaudiorestoration_tpu.models import markers as mk
    from pyaudiorestoration_tpu.utils import audio_io, project

    os.makedirs(d, exist_ok=True)
    sr = 22050
    t = np.arange(3 * sr) / sr
    speed = 1.0 + 0.02 * np.sin(2 * np.pi * 1.2 * t)
    sig = (np.sin(2 * np.pi * 2000 * np.cumsum(speed) / sr) * 0.5
           ).astype(np.float32)
    wow = os.path.join(d, "wow.wav")
    audio_io.write_wav(wow, np.stack([sig, sig * 0.7], -1), sr)
    rng = np.random.default_rng(0)
    noise = (rng.standard_normal(3 * sr) * 0.1).astype(np.float32)
    wow2 = os.path.join(d, "wow2.wav")
    audio_io.write_wav(wow2, np.stack([sig * 0.8 + noise * 0.05,
                                       sig * 0.6], -1), sr)
    comp = os.path.join(d, "comp.wav")  # compressed dynamics vs wow
    env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 0.5 * t))
    audio_io.write_wav(comp, (sig * np.sqrt(env))[:, None].astype(np.float32), sr)
    ref = os.path.join(d, "dyn_ref.wav")
    audio_io.write_wav(ref, (sig * env)[:, None].astype(np.float32), sr)
    hum = os.path.join(d, "hum.wav")
    hum_sig = sig * 0.3 + 0.2 * np.sin(2 * np.pi * 50.5 * t).astype(np.float32)
    audio_io.write_wav(hum, hum_sig[:, None].astype(np.float32), sr)
    base = rng.standard_normal(sr).astype(np.float32) * 0.2
    pan_wav = os.path.join(d, "pan.wav")
    audio_io.write_wav(pan_wav, np.stack([base * 1.5, base], -1), sr)
    proj = project.Project(".pan", {}, {"markers": [
        mk.PanSample((0.1, 100.0), (0.9, 3000.0), 1.5)]})
    pan_proj = os.path.join(d, "pan.pan")
    proj.save(pan_proj)
    for f in ("dropouts_sample.flac", "dropouts_sample.drop", "rhythm.flac",
              "rhythm+5percent.flac"):
        with open(os.path.join(SAMPLES, f), "rb") as s, \
                open(os.path.join(d, f), "wb") as o:
            o.write(s.read())


def cases(d):
    j = lambda *p: os.path.join(d, *p)
    drop = j("dropouts_sample.flac")
    dropp = j("dropouts_sample.drop")
    wow, wow2 = j("wow.wav"), j("wow2.wav")
    return [
        # 360 s probe budget: a cold/contended relay takes >120 s (the
        # default) to init + run the tiny op, and the case right after a
        # false doctor timeout routinely passes on the device
        ("doctor", ["doctor", "--device-timeout", "360"], 420),
        ("respeed", ["respeed", wow, "--fft-size", "2048", "--fft-overlap",
                     "8", "--zeropad", "2", "--sinc-quality", "16",
                     "--save-project"], 600),
        ("respeed-replay", ["respeed", j("wow.spd"), "--suffix", "_p2"], 420),
        ("respeed-stream", ["respeed", wow, "--stream", "--suffix", "_st"], 600),
        ("respeed-batch", ["respeed-batch", wow, wow2,
                           "--sinc-quality", "16"], 600),
        ("tapesync", ["tapesync", j("rhythm.flac"), j("rhythm+5percent.flac"),
                      "--windows", "6", "--window-s", "0.5"], 600),
        ("heal", ["heal", drop, "--project", dropp], 420),
        ("heal-stream", ["heal", drop, "--project", dropp, "--stream",
                         "--suffix", "_st"], 600),
        ("dropouts-batch", ["dropouts-batch", wow, "--fft-size", "512",
                            "--num-bands", "6", "--f-lower", "100",
                            "--f-upper", "1000"], 420),
        ("dropouts-batch-stream", ["dropouts-batch", wow, "--fft-size", "512",
                                   "--num-bands", "6", "--f-lower", "100",
                                   "--f-upper", "1000", "--stream",
                                   "--suffix", "_st"], 600),
        ("renoise", ["renoise", wow, "--selection", "0.5", "1.0",
                     "--gain", "-30"], 420),
        ("renoise-stream", ["renoise", wow, "--selection", "0.5", "1.0",
                            "--gain", "-30", "--stream", "--suffix", "_st"], 600),
        ("renoise-preview", ["renoise", wow, "--selection", "0.5", "1.0",
                             "--gain", "-30", "--preview",
                             j("preview.png")], 420),
        ("hpss", ["hpss", wow, "--fft-size", "512", "--kernel", "9"], 420),
        ("hpss-stream", ["hpss", wow, "--fft-size", "512", "--kernel", "9",
                         "--stream", "--suffix", "_st"], 600),
        ("expand", ["expand", wow], 420),
        ("expand-stream", ["expand", wow, "--stream", "--suffix", "_st"], 600),
        ("pan", ["pan", j("pan.wav"), "--project", j("pan.pan")], 420),
        ("humspeed", ["humspeed", j("hum.wav"), "--analyze-only",
                      "--harmonies", "0"], 420),
        ("difeq", ["difeq", wow2, wow, "-o", j("eq.txt")], 420),
        ("decompress", ["decompress", j("comp.wav"), j("dyn_ref.wav")], 420),
        ("group-delay", ["group-delay", wow, wow2], 420),
        ("measure", ["measure", wow, j("wow_res.wav")], 420),
        ("view", ["view", wow, "-o", j("view.html")], 420),
        ("listen", ["listen", wow, wow2, "-o", j("listen.html")], 420),
        ("cyclic-wow", ["cyclic-wow", wow, "--rpm", "33.333",
                        "--f0", "2000"], 420),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/tpu_smoke")
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "TPU_SMOKE_r05.json"))
    ap.add_argument("--only", help="substring filter on case names")
    args = ap.parse_args()
    make_fixtures(args.dir)
    results, ok = [], True
    for name, argv, tmo in cases(args.dir):
        if args.only and args.only not in name:
            continue
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, "-m", "pyaudiorestoration_tpu",
                                *argv], cwd=REPO, timeout=tmo,
                               capture_output=True, text=True)
            rc, tail = p.returncode, (p.stdout + p.stderr)[-400:]
        except subprocess.TimeoutExpired:
            rc, tail = -9, f"timeout {tmo}s"
        wall = round(time.time() - t0, 1)
        res = {"case": name, "rc": rc, "wall_s": wall}
        if rc != 0:
            res["tail"] = tail
            ok = False
        results.append(res)
        print(json.dumps(res), flush=True)
        # write after every case: a partial run (killed session, wedged
        # relay) still leaves a truthful artifact showing how far it got
        report = {"when": time.strftime("%Y-%m-%dT%H:%MZ", time.gmtime()),
                  "platform": "axon TPU relay (real device)",
                  "passed": sum(r["rc"] == 0 for r in results),
                  "total": len(results), "results": results,
                  "complete": False}
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    report["complete"] = True
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"{report['passed']}/{report['total']} passed -> {args.out}")
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
