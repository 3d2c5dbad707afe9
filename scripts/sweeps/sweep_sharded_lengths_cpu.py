"""CPU-mesh sweep: sharded vs dense restore at shard lengths that are NOT
multiples of the split-cumsum block (documented: bit-parity only for
multiples; here we pin 'still correct within the float envelope')."""
import sys
import numpy as np
sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax.numpy as jnp
from jax.sharding import Mesh
from pyaudiorestoration_tpu.parallel import sharded, mesh as pmesh
from pyaudiorestoration_tpu.pipelines import respeeder_device as rdev

NFFT, STEP, ZP, NT, DRIFT = 1024, 256, 1, 16, 16
MAX_N = 281
sr = 22050
fails = 0
rng = np.random.default_rng(2)
for it, (n_time, Tl) in enumerate([(2, 300), (4, 100), (2, 1000), (4, 1027), (2, 1536)]):
    n = Tl * STEP * n_time
    t = np.arange(n) / sr
    speed = 1.0 + 0.012 * np.sin(2 * np.pi * 0.9 * t)
    x = (np.sin(2 * np.pi * 2000 * np.cumsum(speed) / sr) * 0.5).astype(np.float32)[None, :]
    F = n // STEP + 1
    f0 = 2000.0
    num_bins = NFFT * ZP // 2 + 1
    NL = max(1, min(num_bins - 1, int(round(f0 * 2 ** (-1/6) * NFFT * ZP / sr))))
    NU = max(2, min(num_bins - 1, int(round(f0 * 2 ** (1/6) * NFFT * ZP / sr))))
    NLs = np.full((F,), NL, np.int32); NUs = np.full((F,), NU, np.int32)
    devs = np.array(jax.devices()[:n_time]).reshape(1, n_time)
    mesh = Mesh(devs, ("files", "time"))
    xs = pmesh.shard_time_batch(mesh, x)
    try:
        pad_s, nn_s, bi_s, bf_s = (np.asarray(a) for a in sharded.restore_fused_sharded(
            mesh, xs, NLs, NUs, NFFT, STEP, ZP, MAX_N, NT, DRIFT, band=(NL-1, NU+1)))
    except Exception as e:
        print(f"[{it}] EXC n_time={n_time} Tl={Tl}: {type(e).__name__}: {e}")
        fails += 1
        continue
    pad_d = np.asarray(rdev.restore_fused_device(
        jnp.asarray(x[0]), jnp.asarray(NLs), jnp.asarray(NUs), NFFT, STEP, ZP,
        MAX_N, NT, DRIFT, band=(NL-1, NU+1)))
    d = np.max(np.abs(pad_s[0] - pad_d))
    bit = np.array_equal(pad_s[0], pad_d)
    ok = d < 1e-3
    fails += (not ok)
    mult = (Tl % 1024 == 0)
    print(f"[{it}] {'ok' if ok else 'FAIL'} n_time={n_time} Tl={Tl} block-mult={mult} maxdiff={d:.2e} bitexact={bit}")
print("FAILS:", fails)
