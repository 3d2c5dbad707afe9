"""restore_file_fast: stereo file in, restored stereo file out."""

import numpy as np

from pyaudiorestoration_tpu.pipelines import respeeder_device as rdev
from pyaudiorestoration_tpu.utils import audio_io
from tests.test_respeeder import tone_stability


def test_restore_file_fast_stereo(tmp_path):
    sr = 44100
    n = 3 * sr
    t = np.arange(n) / sr
    speed = 1.0 + 0.02 * np.sin(2 * np.pi * 0.8 * t)
    phase = 2 * np.pi * 3000.0 * np.cumsum(speed) / sr
    left = (np.sin(phase) * 0.5).astype(np.float32)
    right = (np.sin(phase * 0.5) * 0.4).astype(np.float32)  # octave below
    src = tmp_path / "st.wav"
    audio_io.write_wav(src, np.stack([left, right], -1), sr)
    out_path = rdev.restore_file_fast(str(src), sinc_quality=30)
    out, osr, ch = audio_io.read_file(out_path)
    assert ch == 2 and osr == sr
    # both channels restored through the shared curve
    sl = tone_stability(left.astype(float), sr)
    assert tone_stability(out[:, 0].astype(float), sr) < sl * 0.2
    sr_r = tone_stability(right.astype(float), sr)
    assert tone_stability(out[:, 1].astype(float), sr) < sr_r * 0.3
