"""TPU sweep: adversarial lengths through the fused pallas path vs XLA banded."""
import sys
import numpy as np
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from pyaudiorestoration_tpu.pipelines import respeeder_device as rdev

rng = np.random.default_rng(7)
sr = 22050
fft, overlap, zp, q, drift = 2048, 4, 2, 50, 16
hop = fft // overlap
fails = 0
# adversarial lengths: around 1024/4096 multiples, primes, tiny, seg_tile edge
lens = [40960, 40961, 40959, 39937, 65536 + 1, 65536 - 1, 49999, 8192 + 513,
        1024 * 37 + 1, 104729]
for it, n in enumerate(lens):
    t = np.arange(n) / sr
    speed = 1.0 + 0.02 * np.sin(2 * np.pi * 1.3 * t) + 0.004 * np.sin(2 * np.pi * 6.1 * t)
    f0 = 2000.0
    sig = (np.sin(2 * np.pi * f0 * np.cumsum(speed) / sr) * 0.5).astype(np.float32)
    num_bins = fft * zp // 2 + 1
    tolr = 1.0 / 6
    NL = max(1, min(num_bins - 1, int(round(f0 * 2 ** -tolr * fft * zp / sr))))
    NU = max(2, min(num_bins - 1, int(round(f0 * 2 ** tolr * fft * zp / sr))))
    n_frames = (n + (fft // 2) * 2 - fft) // hop + 1
    NLs = jnp.full((n_frames,), NL, jnp.int32)
    NUs = jnp.full((n_frames,), NU, jnp.int32)
    max_n = int(hop * 1.1)
    try:
        out_x = np.asarray(rdev.restore_fused_device(
            jnp.asarray(sig), NLs, NUs, fft, hop, zp, max_n, q, drift,
            backend="xla", band=(NL - 1, NU + 1)))
        out_p = np.asarray(rdev.restore_fused_device(
            jnp.asarray(sig), NLs, NUs, fft, hop, zp, max_n, q, drift,
            backend="pallas", band=(NL - 1, NU + 1)))
    except Exception as e:
        print(f"[{it}] EXC n={n}: {type(e).__name__}: {e}"); fails += 1; continue
    d = np.max(np.abs(out_x - out_p))
    nan = bool(np.isnan(out_p).any() or np.isnan(out_x).any())
    ok = d < 3e-5 and not nan
    fails += (not ok)
    print(f"[{it}] {'ok' if ok else 'FAIL'} n={n} T={n//hop} maxdiff={d:.2e} nan={nan}")
# stereo + 3-channel through the shared curve
for C in (2, 3):
    n = 40961
    t = np.arange(n) / sr
    speed = 1.0 + 0.015 * np.sin(2 * np.pi * 1.1 * t)
    sig = np.stack([(np.sin(2 * np.pi * 2000 * np.cumsum(speed) / sr) * 0.5 * (1 - 0.1 * c)).astype(np.float32) for c in range(C)])
    n_frames = (n + (fft // 2) * 2 - fft) // hop + 1
    num_bins = fft * zp // 2 + 1
    NL = int(round(2000 * 2 ** -0.17 * fft * zp / sr)); NU = int(round(2000 * 2 ** 0.17 * fft * zp / sr))
    NLs = jnp.full((n_frames,), NL, jnp.int32); NUs = jnp.full((n_frames,), NU, jnp.int32)
    max_n = int(hop * 1.1)
    out_x = np.asarray(rdev.restore_fused_device(jnp.asarray(sig), NLs, NUs, fft, hop, zp, max_n, q, drift, backend="xla", band=(NL-1, NU+1)))
    out_p = np.asarray(rdev.restore_fused_device(jnp.asarray(sig), NLs, NUs, fft, hop, zp, max_n, q, drift, backend="pallas", band=(NL-1, NU+1)))
    d = np.max(np.abs(out_x - out_p))
    ok = d < 3e-5
    fails += (not ok)
    print(f"[C={C}] {'ok' if ok else 'FAIL'} maxdiff={d:.2e}")
print("FAILS:", fails)
