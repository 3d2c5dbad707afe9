"""Benchmark: wow/flutter restoration of a 192 kHz tape transfer on one chip.

Prints the PRIMARY JSON line first (single stereo take — the north-star
metric; it also carries the batch number as ``batch8_x_realtime`` for
one-line parsers), then a second JSON line for the 8-take independent batch
tier (``restore_fused_takes`` — the digitization-batch serving shape,
VERDICT r04 #3; reference anchor: the sequential file loop,
resampling.py:168 / pyrespeeder_gui.py:142-159):
  {"metric": ..., "value": N, "unit": "x_realtime", "vs_baseline": N}

Measures the device-resident restoration pipeline (STFT -> banded peak
tracking -> speed curve -> dithered position plan -> windowed-sinc resample,
pyaudiorestoration_tpu/pipelines/respeeder_device.py) on the BASELINE.json
north-star workload: samples/flutter_192.flac tiled to a 30 s take.  The
signal is uploaded once; the timed loop covers all device compute plus the
per-take host position planning (the ~100 KB control-plane round trip).
``vs_baseline`` is value / 100 — the fraction of the >=100x-realtime target
(the reference publishes no numbers, BASELINE.md).

Note: this dev environment tunnels the TPU through a relay whose
device->host bandwidth is ~1 MB/s; bulk output download is excluded here as
an environment artifact (production PCIe moves the 23 MB result in ~10 ms).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("AUDIOIO_NO_IDX", "1")  # keep the reference dir pristine
SAMPLE = "/root/reference/samples/flutter_192.flac"
REPEAT_S = float(os.environ.get("BENCH_SECONDS", "30"))  # override for smoke-testing the harness


def main():
    # a wedged device relay hangs jax.devices() forever; probe boundedly in
    # a subprocess first so a dead environment fails fast instead
    from pyaudiorestoration_tpu.utils.doctor import _probe_devices

    status, info = _probe_devices(600.0)
    if status != "ok":
        print(f"bench: device runtime unavailable ({status}): {info}",
              file=sys.stderr)
        sys.exit(3)

    import jax
    import jax.numpy as jnp

    from pyaudiorestoration_tpu.pipelines import respeeder_device as rdev
    from pyaudiorestoration_tpu.utils import audio_io
    from pyaudiorestoration_tpu.utils.device import enable_persistent_compile_cache

    enable_persistent_compile_cache()  # cold compile is minutes; 1x/machine

    sig, sr, _ = audio_io.read_file(SAMPLE)
    reps = max(1, int(REPEAT_S * sr / len(sig)))
    mono = np.tile(sig[:, 0], reps)
    # the north star take is STEREO: run both channels through the shared curve
    big = np.stack([mono, mono * 0.8])
    audio_seconds = big.shape[1] / sr

    # detect the pilot tone once (host, tiny FFT of a slice)
    probe = mono[: 1 << 18]
    spec = np.abs(np.fft.rfft(probe * np.hanning(len(probe))))
    f0 = float(np.argmax(spec[10:]) + 10) / len(probe) * sr

    sig_dev = jax.device_put(jnp.asarray(big))
    sig_dev.block_until_ready()

    fft_size, overlap, zp, q = 4096, 8, 2, 50
    hop = fft_size // overlap
    n = big.shape[1]
    tol = 1.0 / 12
    num_bins = fft_size * zp // 2 + 1
    NL = max(1, min(num_bins - 1, int(round(max(1.0, f0 * 2 ** -tol) * fft_size * zp / sr))))
    NU = max(1, min(num_bins - 1, int(round(min(sr / 2, f0 * 2 ** tol) * fft_size * zp / sr))))
    n_frames = (n + (fft_size // 2) * 2 - fft_size) // hop + 1
    NLs = jax.device_put(jnp.full((n_frames,), NL, jnp.int32))
    NUs = jax.device_put(jnp.full((n_frames,), NU, jnp.int32))
    max_n = int(hop * 1.1)

    backend = rdev._sinc_backend("auto")

    def run():
        padded = rdev.restore_fused_device(sig_dev, NLs, NUs, fft_size, hop, zp,
                                           max_n, q, 16, backend=backend,
                                           band=(NL - 1, NU + 1))
        # a dependent scalar fetch forces execution (block_until_ready is a
        # no-op through this environment's device relay)
        return float(jnp.sum(padded))

    t0 = time.perf_counter()
    run()  # compile
    cold = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    wall = min(times)
    rtf = audio_seconds / wall

    # ---- batch tier: 8 INDEPENDENT takes in one dispatch ----------------
    B = 8
    takes = np.stack([mono * (0.5 + 0.06 * i) for i in range(B)])
    takes_dev = jax.device_put(jnp.asarray(takes))
    float(jnp.sum(takes_dev))  # force the upload out of the timed region
    NLb = jax.device_put(jnp.broadcast_to(NLs, (B, n_frames)))
    NUb = jax.device_put(jnp.broadcast_to(NUs, (B, n_frames)))
    batch_audio_s = B * (takes.shape[1] / sr)

    def run_batch():
        padded = rdev.restore_fused_takes(takes_dev, NLb, NUb, fft_size, hop,
                                          zp, max_n, q, 16, backend=backend,
                                          band=(NL - 1, NU + 1))
        return float(jnp.sum(padded))

    t0 = time.perf_counter()
    run_batch()  # compile
    batch_cold = time.perf_counter() - t0
    batch_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_batch()
        batch_times.append(time.perf_counter() - t0)
    batch_rtf = batch_audio_s / min(batch_times)

    # the relay floor varies run to run (measured 550-600x); the headline is
    # min-of-5 warm, and the full runs array + cold (compile-inclusive) wall
    # ride along so BENCH_r*.json carries its own variance context
    print(json.dumps({
        "metric": "192kHz stereo flutter-correction realtime factor (1 chip, device-resident)",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 100.0, 3),
        "runs_x_realtime": [round(audio_seconds / t, 1) for t in times],
        "wall_cold_s": round(cold, 3),
        "audio_s": round(audio_seconds, 2),
        "batch8_x_realtime": round(batch_rtf, 2),
    }))
    print(json.dumps({
        "metric": "8-take independent batch aggregate realtime factor (1 chip, restore_fused_takes)",
        "value": round(batch_rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(batch_rtf / 100.0, 3),
        "runs_x_realtime": [round(batch_audio_s / t, 1) for t in batch_times],
        "wall_cold_s": round(batch_cold, 3),
        "audio_s": round(batch_audio_s, 2),
    }))


if __name__ == "__main__":
    main()
