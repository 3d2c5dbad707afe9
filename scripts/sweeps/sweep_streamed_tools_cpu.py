"""CPU sweep: streamed vs in-memory for renoise / hpss / dropouts-batch at
adversarial lengths."""
import sys, os, tempfile
import numpy as np
sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
from pyaudiorestoration_tpu.utils import audio_io
from pyaudiorestoration_tpu.pipelines import renoiser, hpss_tool, dropouts

rng = np.random.default_rng(9)
d = tempfile.mkdtemp()
sr = 22050
fails = 0
lens = [49999, 65537, 131072 + 511]
for it, n in enumerate(lens):
    t = np.arange(n) / sr
    x = (0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)).astype(np.float32)
    nch = 1 + it % 2
    xx = np.stack([x * (1 - 0.1 * c) for c in range(nch)], axis=1)
    src = os.path.join(d, f"a{it}.wav")
    audio_io.write_wav(src, xx, sr)
    # renoise: profile from a noise slice
    noise = xx[: sr // 2]
    npth = os.path.join(d, f"n{it}.wav")
    audio_io.write_wav(npth, noise, sr)
    try:
        p_m = renoiser.process_file(src, noise_path=npth, gain=-6.0, fft_size=1024,
                                    fft_overlap=4, suffix=f"_m{it}", stream=False)
        p_s = renoiser.process_file(src, noise_path=npth, gain=-6.0, fft_size=1024,
                                    fft_overlap=4, suffix=f"_s{it}", stream=True)
        a = audio_io.read_file(p_m)[0]; b = audio_io.read_file(p_s)[0]
        m = min(len(a), len(b)); pad = 1024
        dmax = np.max(np.abs(a[pad:m-pad] - b[pad:m-pad]))
        ok = a.shape == b.shape and dmax < 3e-6
        fails += (not ok)
        print(f"[renoise {it}] {'ok' if ok else 'FAIL'} n={n} ch={nch} shapes {a.shape}/{b.shape} interior maxdiff={dmax:.2e}")
    except Exception as e:
        fails += 1
        print(f"[renoise {it}] EXC: {type(e).__name__}: {e}")
    try:
        outs_m = hpss_tool.separate_file(src, fft_size=1024, kernel_size=17, stream=False)
        saved = []
        for pth in outs_m:
            new = pth + ".mem.wav"
            os.replace(pth, new)
            saved.append(new)
        outs_s = hpss_tool.separate_file(src, fft_size=1024, kernel_size=17, stream=True)
        worst = 0.0
        for pm, ps in zip(saved, outs_s):
            a = audio_io.read_file(pm)[0]; b = audio_io.read_file(ps)[0]
            m = min(len(a), len(b)); pad = 2048
            worst = max(worst, float(np.max(np.abs(a[pad:m-pad] - b[pad:m-pad]))))
        ok = worst < 1e-5
        fails += (not ok)
        print(f"[hpss {it}] {'ok' if ok else 'FAIL'} interior maxdiff={worst:.2e}")
    except Exception as e:
        fails += 1
        print(f"[hpss {it}] EXC: {type(e).__name__}: {e}")
    try:
        # dropouts-batch: inject band-limited dropouts, compare streamed
        drop = xx.copy()
        for c0 in (n // 3, 2 * n // 3):
            drop[c0:c0 + 400] *= 0.05
        dsrc = os.path.join(d, f"drop{it}.wav")
        audio_io.write_wav(dsrc, drop, sr)
        p_m = dropouts.process_heuristic(dsrc, fft_size=512, num_bands=6,
                                         f_lower=100.0, f_upper=1000.0,
                                         suffix=f"_dm{it}", stream=False)
        p_s = dropouts.process_heuristic(dsrc, fft_size=512, num_bands=6,
                                         f_lower=100.0, f_upper=1000.0,
                                         suffix=f"_ds{it}", stream=True)
        a = audio_io.read_file(p_m)[0]; b = audio_io.read_file(p_s)[0]
        m = min(len(a), len(b)); pad = 2048
        dmax = float(np.max(np.abs(a[pad:m-pad] - b[pad:m-pad])))
        ok = a.shape == b.shape and dmax < 1e-4
        fails += (not ok)
        print(f"[dropouts {it}] {'ok' if ok else 'FAIL'} interior maxdiff={dmax:.2e}")
    except Exception as e:
        fails += 1
        print(f"[dropouts {it}] EXC: {type(e).__name__}: {e}")
print("FAILS:", fails)
