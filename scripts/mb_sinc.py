import time
import numpy as np
import jax
import jax.numpy as jnp
from pyaudiorestoration_tpu.kernels.sinc_pallas import sinc_banded_pallas_dma_segments
from pyaudiorestoration_tpu.utils.device import enable_persistent_compile_cache

enable_persistent_compile_cache()

sr = 192000
n = sr * 60
T = n // 400
rng = np.random.default_rng(0)
sig = jnp.asarray(rng.standard_normal(n).astype(np.float32))
sp = (1.0 + 0.01 * np.sin(np.linspace(0, 200, T + 1))).astype(np.float32)
nseg = jnp.asarray(np.full(T, 400, np.int32))
base = jnp.asarray((np.arange(T, dtype=np.int64) * 400).astype(np.int32))
frac = jnp.asarray(np.zeros(T, np.float32))

def run():
    out = sinc_banded_pallas_dma_segments(
        sig, jnp.asarray(sp[:-1]), jnp.asarray(sp[1:]), nseg, base, frac,
        max_n=512, nt=50, drift=32)
    return float(jnp.sum(out))

t0 = time.time(); s = run(); print("cold", time.time() - t0, s, flush=True)
times = []
for _ in range(5):
    t0 = time.time(); run(); times.append(time.time() - t0)
print("warm min/med:", min(times), sorted(times)[2], flush=True)
