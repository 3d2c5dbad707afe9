"""Round-5 end-to-end file proofs: heal + tapesynch at >=30 s, streamed RTF.

Extends scripts/e2e_file_proof.py (the respeeder flagship proof) to the two
configs VERDICT r04 #5 called out as relay-RTT-dominated on the short
reference fixtures, plus the streamed (larger-than-memory) tier VERDICT r04
#4 asked to time on real hardware:

  heal       dropouts_sample.flac tiled to >=30 s, its curated .drop boxes
             replicated per repetition (reference: the heal loop,
             dropout_healer_gui.py:111-166).  Relay legs line-itemed exactly
             like the respeeder proof: rtf_core excludes upload/download.
  tapesynch  rhythm.flac (32 s) aligned to rhythm+5percent.flac — BASELINE
             config 4 at full fixture length (pytapesynch_gui.py:145-155).
             Device calls are interleaved with host marker logic here, so
             the relay cannot be isolated per leg; the report says so.
  streamed   flutter_192.flac tiled to >=N seconds (default 300 s), run
             through restore_file_streamed with per-pass timings
             (reference blockwise pattern: experiments/pyrespeeder_cmd.py).

Usage: python scripts/e2e_proofs_r05.py [heal|tapesynch|streamed|all]
           [--seconds 30] [--streamed-seconds 300]
           [--out docs/BASELINE_RESULTS_r05.json]
Writes {"heal_e2e": ..., "tapesynch_e2e": ..., "streamed_tpu": ...} merged
into the output JSON.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("AUDIOIO_NO_IDX", "1")  # keep the reference dir pristine
SAMPLES = "/root/reference/samples"


def proof_heal(workdir, seconds):
    import jax.numpy as jnp

    from pyaudiorestoration_tpu.models import markers as mk
    from pyaudiorestoration_tpu.ops import fourier
    from pyaudiorestoration_tpu.pipelines import dropouts
    from pyaudiorestoration_tpu.utils import audio_io, project

    src = os.path.join(SAMPLES, "dropouts_sample.flac")
    sig, sr, _ = audio_io.read_file(src)
    dur = len(sig) / sr
    reps = max(1, int(np.ceil(seconds / dur)))
    big = np.tile(sig, (reps, 1))
    audio_seconds = len(big) / sr
    in_wav = os.path.join(workdir, "heal_take.wav")
    audio_io.write_wav(in_wav, big, sr)

    proj = project.Project.load(os.path.join(SAMPLES, "dropouts_sample.drop"))
    base_drops = proj.marker_list("dropouts")
    drops = [mk.DropoutSample((d.a[0] + r * dur, d.a[1]),
                              (d.b[0] + r * dur, d.b[1]), d.surrounding)
             for r in range(reps) for d in base_drops]
    fft_size, overlap = proj.fft_size, proj.fft_overlap
    hop = fft_size // overlap

    def one_run():
        t = {}
        t0 = time.perf_counter()
        x, sr2, ch = audio_io.read_file(in_wav)
        t["read_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        n = len(x)
        boxes = dropouts._boxes_array(drops, sr2, hop, fft_size)
        y_pad = np.asarray(fourier.fix_length(x, n + fft_size // 2, axis=0))
        host = np.ascontiguousarray(y_pad[:, list(range(ch))].T)
        t["boxes_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        x_dev = jnp.asarray(host)
        float(jnp.sum(x_dev))  # dependent fetch: upload complete
        t["upload_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        out_dev = dropouts._heal_fused(x_dev, jnp.asarray(boxes), fft_size,
                                       hop, n)
        float(jnp.sum(out_dev))  # force the dispatch, tiny fetch
        t["device_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        out_np = np.asarray(out_dev)  # relay download of the healed take
        t["download_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        audio_io.write_wav(os.path.join(workdir, "heal_take_drops.wav"),
                           out_np.T, sr2)
        t["write_s"] = time.perf_counter() - t0

        core = t["read_s"] + t["boxes_s"] + t["device_s"] + t["write_s"]
        t["rtf_core"] = audio_seconds / core
        t["rtf_with_relay"] = audio_seconds / (
            core + t["upload_s"] + t["download_s"])
        return t

    cold = one_run()
    warm = one_run()
    return {
        "sample": src,
        "audio_seconds": audio_seconds,
        "n_boxes": len(drops),
        "config": {"fft_size": fft_size, "overlap": overlap},
        "cold": cold,
        "warm": warm,
        "rtf_warm": warm["rtf_core"],
        "note": "rtf_core = read + boxes + device(_heal_fused, all boxes in "
                "one scan dispatch) + write; relay upload/download are their "
                "own line items, as in the respeeder proof",
    }


def proof_tapesynch(workdir, _seconds):
    import shutil

    from pyaudiorestoration_tpu.pipelines import tapesynch
    from pyaudiorestoration_tpu.utils import audio_io

    ref = os.path.join(SAMPLES, "rhythm.flac")
    src = os.path.join(SAMPLES, "rhythm+5percent.flac")
    src_local = os.path.join(workdir, "rhythm_src.flac")
    shutil.copy(src, src_local)

    def one_run():
        t = {}
        t0 = time.perf_counter()
        ref_signal, sr, _ = audio_io.read_file(ref)
        src_signal, sr2, _ = audio_io.read_file(src_local)
        t["read_s"] = time.perf_counter() - t0
        audio_seconds = len(src_signal) / sr2

        t0 = time.perf_counter()
        samples, lag_curve = tapesynch.auto_align(
            ref_signal, src_signal, sr, num_windows=8, window_s=1.0)
        t["align_s"] = time.perf_counter() - t0

        from pyaudiorestoration_tpu.ops import resampling
        t0 = time.perf_counter()
        paths = resampling.run((src_local,),
                               signal_data=((src_signal, sr),),
                               lag_curve=lag_curve, resampling_mode="Sinc",
                               sinc_quality=50, suffix="_proof")
        t["export_s"] = time.perf_counter() - t0

        total = t["read_s"] + t["align_s"] + t["export_s"]
        t["rtf"] = audio_seconds / total
        t["audio_seconds"] = audio_seconds
        return t, paths

    cold, _ = one_run()
    warm, _ = one_run()
    return {
        "ref": ref,
        "src": src,
        "audio_seconds": warm["audio_seconds"],
        "cold": cold,
        "warm": warm,
        "rtf_warm": warm["rtf"],
        "note": "BASELINE config 4 at full 30.5 s fixture length.  Device "
                "calls (speed-ratio probe, window resample, batched IIR + "
                "find_delay, sinc export) interleave with host marker logic "
                "(spline lag curve, LagSample assembly), so relay transfers "
                "cannot be isolated per leg here — rtf is the honest "
                "in-this-environment number including every relay hop.",
    }


def proof_streamed(workdir, seconds):
    from pyaudiorestoration_tpu.pipelines import respeeder_device as rdev
    from pyaudiorestoration_tpu.utils import audio_io

    src = os.path.join(SAMPLES, "flutter_192.flac")
    sig, sr, _ = audio_io.read_file(src)
    mono = sig[:, 0]
    reps = max(1, int(np.ceil(seconds * sr / len(mono))))
    big = np.tile(mono, reps)[:, None]
    audio_seconds = len(big) / sr
    in_wav = os.path.join(workdir, "streamed_take.wav")
    audio_io.write_wav(in_wav, big, sr)

    timings = {}
    t0 = time.perf_counter()
    out_path = rdev.restore_file_streamed(in_wav, resume=False,
                                          timings=timings)
    total = time.perf_counter() - t0
    core = (timings.get("pass1_read_s", 0.0) + timings["plan_s"]
            + timings.get("pass2_read_s", 0.0) + timings["pass2_write_s"])
    # the device legs bundle compute with the relay transfers; report both
    # the honest total and the device-leg share so the relay cost is visible
    report = {
        "sample": src,
        "audio_seconds": audio_seconds,
        "out": out_path,
        "timings": {k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in timings.items()},
        "total_s": round(total, 3),
        "rtf_total": round(audio_seconds / total, 2),
        "host_legs_s": round(core, 3),
        "note": "restore_file_streamed, two passes; pass1_device_s and "
                "pass2_device_dl_s bundle device compute with relay "
                "upload/download (block-granular transfers are inherent to "
                "the streaming tier).  rtf_total is the honest wall number "
                "in this relay environment.",
    }
    os.remove(in_wav)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=["all"])
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--streamed-seconds", type=float, default=300.0)
    ap.add_argument("--out", default="docs/BASELINE_RESULTS_r05.json")
    ap.add_argument("--workdir", default="/dev/shm/e2e_proof_r05")
    args = ap.parse_args()
    configs = args.configs or ["all"]
    if "all" in configs:
        configs = ["heal", "tapesynch", "streamed"]

    from pyaudiorestoration_tpu.utils.device import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    os.makedirs(args.workdir, exist_ok=True)

    merged = {}
    out = os.path.join(REPO, args.out) if not os.path.isabs(args.out) else args.out
    if os.path.exists(out):
        with open(out) as f:
            merged = json.load(f)
    for cfg in configs:
        fn = {"heal": proof_heal, "tapesynch": proof_tapesynch,
              "streamed": proof_streamed}[cfg]
        secs = args.streamed_seconds if cfg == "streamed" else args.seconds
        print(f"=== {cfg} ===", flush=True)
        report = fn(args.workdir, secs)
        print(json.dumps(report, indent=2), flush=True)
        merged[{"heal": "heal_e2e", "tapesynch": "tapesynch_e2e",
                "streamed": "streamed_tpu"}[cfg]] = report
        with open(out, "w") as f:
            json.dump(merged, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
