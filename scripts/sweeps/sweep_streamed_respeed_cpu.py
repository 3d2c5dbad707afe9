"""CPU: streamed vs in-memory fast restore parity at adversarial lengths."""
import sys, os, tempfile
import numpy as np
sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
from pyaudiorestoration_tpu.pipelines import respeeder_device as rdev
from pyaudiorestoration_tpu.utils import audio_io

d = tempfile.mkdtemp()
sr = 22050
fails = 0
lens = [49999, 65537, 104729]
for it, n in enumerate(lens):
    t = np.arange(n) / sr
    speed = 1.0 + 0.015 * np.sin(2 * np.pi * 1.2 * t)
    sig = (np.sin(2 * np.pi * 2000 * np.cumsum(speed) / sr) * 0.5).astype(np.float32)
    nch = 1 + it % 2
    x = np.stack([sig * (1 - 0.1 * c) for c in range(nch)], axis=1)
    src = os.path.join(d, f"s{it}.wav")
    audio_io.write_wav(src, x, sr)
    p_mem = rdev.restore_file_fast(src, fft_size=2048, fft_overlap=4, zeropad=2,
                                   sinc_quality=50, suffix=f"_m{it}", stream=False)
    p_str = rdev.restore_file_fast(src, fft_size=2048, fft_overlap=4, zeropad=2,
                                   sinc_quality=50, suffix=f"_s{it}", stream=True)
    a = audio_io.read_file(p_mem)[0]
    b = audio_io.read_file(p_str)[0]
    same = a.shape == b.shape
    m = min(len(a), len(b))
    dmax = float(np.max(np.abs(a[:m] - b[:m]))) if m else 1.0
    ok = same and dmax == 0.0
    fails += (not ok)
    print(f"[{it}] {'ok' if ok else 'FAIL'} n={n} ch={nch} shapes {a.shape}/{b.shape} maxdiff={dmax:.2e}")
print("FAILS:", fails)
