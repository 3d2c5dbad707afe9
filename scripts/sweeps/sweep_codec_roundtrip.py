"""Codec property sweep: random signals -> FLAC encode -> full decode +
random-access stream reads, compared against the quantized original."""
import sys, os, tempfile
import numpy as np
sys.path.insert(0, '/root/repo')
from pyaudiorestoration_tpu.utils import audio_io

rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 11)
d = tempfile.mkdtemp()
fails = 0
for it in range(24):
    sr = int(rng.choice([8000, 22050, 44100, 48000, 96000, 192000]))
    nch = int(rng.choice([1, 2]))
    n = int(rng.integers(1, 200000))
    bits = int(rng.choice([16, 24]))
    kind = rng.choice(["noise", "tone", "quiet", "dc", "clip"])
    t = np.arange(n) / sr
    if kind == "noise":
        x = rng.standard_normal((n, nch)) * 0.4
    elif kind == "tone":
        x = np.sin(2 * np.pi * 997 * t)[:, None] * np.linspace(0.9, 0.1, nch)[None, :]
    elif kind == "quiet":
        x = rng.standard_normal((n, nch)) * 1e-4
    elif kind == "dc":
        x = np.full((n, nch), 0.37)
    else:
        x = rng.standard_normal((n, nch)) * 3.0  # clips
    x = x.astype(np.float32)
    p = os.path.join(d, f"t{it}.flac")
    try:
        audio_io.write_flac(p, x, sr, bits_per_sample=bits)
        y, sr2, ch2 = audio_io.read_file(p)
    except Exception as e:
        print(f"[{it}] EXC n={n} ch={nch} sr={sr} bits={bits} {kind}: {type(e).__name__}: {e}")
        fails += 1
        continue
    scale = float(1 << (bits - 1))
    q = np.round(np.clip(x, -1.0, 1.0 - 1.0/scale) * scale) / scale
    if y.ndim == 1:
        y = y[:, None]
    ok = (sr2 == sr and ch2 == nch and y.shape[0] == n
          and np.max(np.abs(y - q)) < 1.5 / scale)
    # random-access parity via StreamReader
    if ok and n > 10:
        try:
            with audio_io.StreamReader(p) as r:
                for _ in range(4):
                    a = int(rng.integers(0, n - 1))
                    cnt = int(rng.integers(1, min(n - a, 50000)))
                    blk = r.read(a, cnt)
                    if blk.ndim == 1:
                        blk = blk[:, None]
                    if not np.array_equal(blk, y[a:a+cnt]):
                        ok = False
                        print(f"[{it}] stream mismatch at {a}+{cnt}")
                        break
        except Exception as e:
            ok = False
            print(f"[{it}] stream EXC: {type(e).__name__}: {e}")
    fails += (not ok)
    print(f"[{it}] {'ok' if ok else 'FAIL'} n={n} ch={nch} sr={sr} bits={bits} {kind}")
print("FAILS:", fails)
