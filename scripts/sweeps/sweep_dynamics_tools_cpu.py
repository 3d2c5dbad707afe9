"""CPU: streamed vs in-memory expander + decompressor at adversarial lengths."""
import sys, os, tempfile
import numpy as np
sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
from pyaudiorestoration_tpu.utils import audio_io
from pyaudiorestoration_tpu.pipelines import expander, decompressor

rng = np.random.default_rng(13)
d = tempfile.mkdtemp()
sr = 44100
fails = 0
for it, n in enumerate([100003, 220501]):
    t = np.arange(n) / sr
    # compressed-sounding content: tone bursts + hf noise
    envl = 0.2 + 0.6 * (np.sin(2 * np.pi * 0.7 * t) > 0)
    x = (envl * np.sin(2 * np.pi * 880 * t) + 0.05 * rng.standard_normal(n)).astype(np.float32)
    xx = np.stack([x, 0.8 * x], axis=1)
    src = os.path.join(d, f"e{it}.wav")
    audio_io.write_wav(src, xx, sr)
    try:
        p_m = expander.expand_file(src, stream=False)
        m1 = audio_io.read_file(p_m)[0]; os.replace(p_m, p_m + ".mem.wav")
        p_s = expander.expand_file(src, stream=True)
        s1 = audio_io.read_file(p_s)[0]
        mm = min(len(m1), len(s1)); pad = 4096
        dmax = float(np.max(np.abs(m1[pad:mm-pad] - s1[pad:mm-pad])))
        ok = m1.shape == s1.shape and dmax < 1e-4
        fails += (not ok)
        print(f"[expand {it}] {'ok' if ok else 'FAIL'} n={n} shapes {m1.shape}/{s1.shape} interior maxdiff={dmax:.2e}")
    except Exception as e:
        fails += 1; print(f"[expand {it}] EXC: {type(e).__name__}: {e}")
    # decompressor: ref = x (dynamic), src = compressed copy
    comp = np.tanh(2.5 * xx) * 0.5
    srcc = os.path.join(d, f"c{it}.wav"); refp = os.path.join(d, f"r{it}.wav")
    audio_io.write_wav(srcc, comp.astype(np.float32), sr)
    audio_io.write_wav(refp, xx, sr)
    try:
        p_m = decompressor.decompress_file(srcc, refp, stream=False)
        m1 = audio_io.read_file(p_m)[0]; os.replace(p_m, p_m + ".mem.wav")
        p_s = decompressor.decompress_file(srcc, refp, stream=True)
        s1 = audio_io.read_file(p_s)[0]
        mm = min(len(m1), len(s1)); pad = sr
        dmax = float(np.max(np.abs(m1[pad:mm-pad] - s1[pad:mm-pad])))
        ok = m1.shape == s1.shape and dmax < 1e-3
        fails += (not ok)
        print(f"[decomp {it}] {'ok' if ok else 'FAIL'} shapes {m1.shape}/{s1.shape} interior maxdiff={dmax:.2e}")
    except Exception as e:
        fails += 1; print(f"[decomp {it}] EXC: {type(e).__name__}: {e}")
print("FAILS:", fails)
