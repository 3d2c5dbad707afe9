"""CPU sweep: restore_fused_takes (flattened batch) vs per-row
restore_fused_device — the batch layout must not change any row's output."""
import sys
import numpy as np
sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from pyaudiorestoration_tpu.pipelines import respeeder_device as rdev

sr = 22050
fft, overlap, zp, q, drift = 1024, 4, 1, 16, 16
hop = fft // overlap
fails = 0
rng = np.random.default_rng(4)
for it, (B, n) in enumerate([(2, 49999), (3, 65537), (2, 30011)]):
    t = np.arange(n) / sr
    takes = []
    for b in range(B):
        speed = 1.0 + (0.008 + 0.004 * b) * np.sin(2 * np.pi * (1.0 + 0.3 * b) * t)
        takes.append((np.sin(2 * np.pi * 2000 * np.cumsum(speed) / sr) * 0.5).astype(np.float32))
    xb = np.stack(takes)
    num_bins = fft * zp // 2 + 1
    NL = max(1, min(num_bins - 1, int(round(2000 * 2 ** (-1/6) * fft * zp / sr))))
    NU = max(2, min(num_bins - 1, int(round(2000 * 2 ** (1/6) * fft * zp / sr))))
    n_frames = (n + (fft // 2) * 2 - fft) // hop + 1
    NLb = jnp.full((B, n_frames), NL, jnp.int32)
    NUb = jnp.full((B, n_frames), NU, jnp.int32)
    max_n = int(hop * 1.1)
    outb = np.asarray(rdev.restore_fused_takes(jnp.asarray(xb), NLb, NUb, fft, hop,
                                               zp, max_n, q, drift, backend="xla",
                                               band=(NL-1, NU+1)))
    worst = 0.0; bit = True
    for b in range(B):
        single = np.asarray(rdev.restore_fused_device(
            jnp.asarray(xb[b]), NLb[0], NUb[0], fft, hop, zp, max_n, q, drift,
            backend="xla", band=(NL-1, NU+1)))
        worst = max(worst, float(np.max(np.abs(outb[b] - single))))
        bit = bit and np.array_equal(outb[b], single)
    ok = worst < 3e-5
    fails += (not ok)
    print(f"[{it}] {'ok' if ok else 'FAIL'} B={B} n={n} maxdiff={worst:.2e} bitexact={bit}")
print("FAILS:", fails)
