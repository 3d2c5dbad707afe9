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
signal is uploaded once; every timed run covers the full device pipeline
(single jit program) forced by a dependent scalar fetch.
``vs_baseline`` is value / 100 — the fraction of the >=100x-realtime target
(the reference publishes no numbers, BASELINE.md).

Measurement shape (round 5): this dev environment tunnels the TPU through a
relay whose per-dispatch round trip measures ~23 ms (a bare
``jnp.sum(x[:8])`` dispatch + scalar fetch times 22.8 ms) — LARGER than the
single-take device step itself (~13-15 ms, at its derived speed-of-light
floor, docs/BENCHMARKS.md).  A one-dispatch-one-fetch loop therefore times
the tunnel, not the pipeline.  The headline ``value`` is the steady-state
PIPELINED rate — K back-to-back dispatches whose outputs fold into one
device scalar, fetched once; wall/K — which is also the production serving
shape (takes stream through the chip; nothing serializes on a host fetch
per take).  The serialized dispatch-fetch-dispatch number rides along as
``x_realtime_serialized`` for comparability with rounds <= 4, whose
headline was measured that way.  Bulk output download stays excluded as an
environment artifact (production PCIe moves the 23 MB result in ~10 ms;
this relay does ~1 MB/s).
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

    def measure(dispatch, k_pipe, n_serial, n_sets):
        """Time one tier both ways.

        serialized: dispatch -> dependent scalar fetch, n_serial times, min.
        pipelined:  k_pipe dispatches folding into one device scalar,
                    fetched once (forces every run: the accumulated sum is
                    data-dependent on all K outputs), wall/k_pipe; best of
                    n_sets.  block_until_ready is a no-op through this
                    relay, hence the dependent-fetch forcing everywhere.
        """
        serial = []
        for _ in range(n_serial):
            t0 = time.perf_counter()
            float(jnp.sum(dispatch()))
            serial.append(time.perf_counter() - t0)
        # warm the tiny fold program (sum + add) outside the timed region
        acc = jnp.float32(0.0)
        for _ in range(2):
            acc = acc + jnp.sum(dispatch())
        float(acc)
        pipe = []
        checks = []
        for _ in range(n_sets):
            t0 = time.perf_counter()
            acc = jnp.float32(0.0)
            for _ in range(k_pipe):
                acc = acc + jnp.sum(dispatch())
            checks.append(float(acc))
            pipe.append((time.perf_counter() - t0) / k_pipe)
        return min(serial), serial, min(pipe), pipe, checks

    def run_single():
        return rdev.restore_fused_device(sig_dev, NLs, NUs, fft_size, hop, zp,
                                         max_n, q, 16, backend=backend,
                                         band=(NL - 1, NU + 1))

    t0 = time.perf_counter()
    float(jnp.sum(run_single()))  # compile
    cold = time.perf_counter() - t0
    s_wall, s_walls, p_wall, p_walls, _ = measure(run_single, k_pipe=16,
                                                  n_serial=5, n_sets=2)
    rtf = audio_seconds / p_wall
    rtf_serial = audio_seconds / s_wall

    # ---- batch tier: 8 INDEPENDENT takes in one dispatch ----------------
    B = 8
    takes = np.stack([mono * (0.5 + 0.06 * i) for i in range(B)])
    takes_dev = jax.device_put(jnp.asarray(takes))
    float(jnp.sum(takes_dev))  # force the upload out of the timed region
    NLb = jax.device_put(jnp.broadcast_to(NLs, (B, n_frames)))
    NUb = jax.device_put(jnp.broadcast_to(NUs, (B, n_frames)))
    batch_audio_s = B * (takes.shape[1] / sr)

    def run_batch():
        return rdev.restore_fused_takes(takes_dev, NLb, NUb, fft_size, hop,
                                        zp, max_n, q, 16, backend=backend,
                                        band=(NL - 1, NU + 1))

    t0 = time.perf_counter()
    float(jnp.sum(run_batch()))  # compile
    batch_cold = time.perf_counter() - t0
    bs_wall, bs_walls, bp_wall, bp_walls, _ = measure(run_batch, k_pipe=6,
                                                      n_serial=3, n_sets=2)
    batch_rtf = batch_audio_s / bp_wall
    batch_rtf_serial = batch_audio_s / bs_wall

    # the relay floor varies run to run; the headline is the best pipelined
    # set, and the serialized walls + cold (compile-inclusive) wall ride
    # along so BENCH_r*.json carries its own variance context
    print(json.dumps({
        "metric": "192kHz stereo flutter-correction realtime factor (1 chip, device-resident, steady-state)",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 100.0, 3),
        "x_realtime_serialized": round(rtf_serial, 2),
        "runs_serialized_x_realtime": [round(audio_seconds / t, 1) for t in s_walls],
        "pipelined_sets_x_realtime": [round(audio_seconds / t, 1) for t in p_walls],
        "wall_cold_s": round(cold, 3),
        "audio_s": round(audio_seconds, 2),
        "batch8_x_realtime": round(batch_rtf, 2),
    }))
    print(json.dumps({
        "metric": "8-take independent batch aggregate realtime factor (1 chip, restore_fused_takes, steady-state)",
        "value": round(batch_rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(batch_rtf / 100.0, 3),
        "x_realtime_serialized": round(batch_rtf_serial, 2),
        "runs_serialized_x_realtime": [round(batch_audio_s / t, 1) for t in bs_walls],
        "pipelined_sets_x_realtime": [round(batch_audio_s / t, 1) for t in bp_walls],
        "wall_cold_s": round(batch_cold, 3),
        "audio_s": round(batch_audio_s, 2),
    }))


if __name__ == "__main__":
    main()
