"""CPU-mesh sweep: lag_resample_sharded vs dense sinc at adversarial
lengths/lag curves (fixed-length st - lg position convention)."""
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
from pyaudiorestoration_tpu.ops import resampling

sr = 22050
rng = np.random.default_rng(6)
fails = 0
for it, (n_time, n, hop) in enumerate([(2, 163840, 128), (4, 327680, 256), (8, 262144, 128)]):
    t = np.arange(n) / sr
    x = (0.4 * np.sin(2 * np.pi * 997 * t) + 0.1 * np.sin(2 * np.pi * 3001 * t)).astype(np.float32)[None, :]
    st = np.linspace(0, n, 17)
    lg = np.cumsum(rng.uniform(-30, 50, 17))
    devs = np.array(jax.devices()[:n_time]).reshape(1, n_time)
    mesh = Mesh(devs, ("files", "time"))
    xs = pmesh.shard_time_batch(mesh, x)
    try:
        out = np.asarray(sharded.lag_resample_sharded(mesh, xs, st, lg, hop=hop, nt=16, drift=8)[0])
    except Exception as e:
        print(f"[{it}] EXC: {type(e).__name__}: {e}"); fails += 1; continue
    pos = np.clip(np.interp(np.arange(n), st, st - lg), 0, n)
    ref = np.asarray(resampling.sinc_resample(x[0], pos, quality=16))
    m = min(len(out), len(ref)); pad = 2048
    d = np.max(np.abs(out[pad:m-pad] - ref[pad:m-pad]))
    ok = d < 1e-4
    fails += (not ok)
    print(f"[{it}] {'ok' if ok else 'FAIL'} n={n} n_time={n_time} hop={hop} interior maxdiff={d:.2e}")
print("FAILS:", fails)
