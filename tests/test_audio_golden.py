"""Golden regression vectors for the librosa-replacement DSP (eval/audio.py).

librosa 0.9.2 (the reference's pin, requirements.txt:34) is not installable
here, so these fixtures pin today's verified behaviour: any future edit that
shifts the onset envelope, the peak-pick rule, the mel filterbank, or the
RMS/backtrack path will fail loudly instead of silently moving the
beat-align/alignment metrics (reference protocol:
scripts/test_RAG_ted.py:113, scripts_beat/utils/metric.py:60-74,186).

The parameter-by-parameter mapping to librosa 0.9.2 defaults lives in
docs/DESIGN.md ("librosa replacement: defaults table").
"""

import numpy as np
import pytest

from livelyspeaker_tpu.eval.audio import (
    mel_filterbank,
    onset_backtrack,
    onset_detect,
    onset_strength,
    peak_pick,
    rms_from_stft,
    stft_mag,
)

SR = 16000


def sig_clicks(dur=3.0):
    y = np.zeros(int(SR * dur), np.float32)
    for s in (0.5, 1.2, 1.9, 2.6):
        j = int(s * SR)
        y[j : j + 400] += (
            np.sin(2 * np.pi * 880 * np.arange(400) / SR) * np.hanning(400)
        ).astype(np.float32)
    return y


def sig_chirp(dur=2.0):
    n = int(SR * dur)
    t = np.arange(n) / SR
    y = (0.3 * np.sin(2 * np.pi * (200 + 300 * t) * t)).astype(np.float32)
    j0, j1 = int(0.8 * SR), int(0.85 * SR)
    y[j0:j1] += (
        0.8 * np.sin(2 * np.pi * 1500 * np.arange(j1 - j0) / SR)
    ).astype(np.float32)
    return y


def sig_bursts(dur=2.5):
    rng = np.random.default_rng(77)
    y = (0.01 * rng.normal(size=int(SR * dur))).astype(np.float32)
    for s in (0.4, 1.0, 1.7):
        j = int(s * SR)
        y[j : j + 800] += (0.5 * rng.normal(size=800)).astype(np.float32)
    return y


# (signal, env_len, env_sum, env_max, onsets@sr16k, onsets@sr22050-default,
#  backtracked-to-rms-minimum onsets)
GOLDEN = [
    (
        sig_clicks, 94, 35.391235, 5.327101,
        [16, 17, 38, 39, 60, 61, 82, 83],
        [16, 38, 60, 82],
        [13, 13, 35, 35, 57, 57, 79, 79],
    ),
    (sig_chirp, 63, 58.773388, 28.569235, [26], [26], [22]),
    (
        sig_bursts, 79, 148.095688, 20.357237,
        [14, 15, 32, 33, 54, 55],
        [13, 32, 54],
        [10, 10, 29, 29, 51, 51],
    ),
]


def test_golden_onset_envelope_and_detect():
    for make, n, esum, emax, on16, on22, bt in GOLDEN:
        y = make()
        env = onset_strength(y, sr=SR)
        assert len(env) == n
        np.testing.assert_allclose(env.sum(), esum, rtol=1e-4)
        np.testing.assert_allclose(env.max(), emax, rtol=1e-4)
        # peak-pick windows sized at the true sr (TED path,
        # test_RAG_ted.py:113 passes sr=16000)
        assert onset_detect(y, sr=SR).tolist() == on16
        # and at librosa's default sr=22050 (BEAT path, metric.py:74 omits
        # sr so librosa uses its default for the window sizes)
        assert onset_detect(onset_envelope=env, sr=22050).tolist() == on22
        # backtrack to the preceding RMS minimum (metric.py:73-74)
        rms = rms_from_stft(stft_mag(y))
        assert onset_backtrack(np.asarray(on16), rms).tolist() == bt


def test_golden_mel_filterbank():
    m = mel_filterbank(SR, 2048, 128)
    assert m.shape == (128, 1025)
    np.testing.assert_allclose(m.sum(), 16.38391304, rtol=1e-6)
    np.testing.assert_allclose(
        m.sum(axis=1)[::16],
        [0.12799929, 0.12799931, 0.12799929, 0.12822041,
         0.12811266, 0.12805726, 0.12785411, 0.12801555],
        rtol=1e-5,
    )


def test_peak_pick_matches_librosa_windows():
    """Slice-exclusive windows + strict wait rule (librosa 0.9.2
    util.peak_pick semantics)."""
    x = np.array([0.0, 1.0, 0.9, 1.0, 0.0, 0.0, 0.0, 0.0])
    # pre_max=0, post_max=1 -> max window is {x[i]}: trivially a local max,
    # so both high frames pass the mean test (degenerate 16 kHz TED case)
    got = peak_pick(x, pre_max=0, post_max=1, pre_avg=3, post_avg=4,
                    delta=0.07, wait=0)
    assert got.tolist() == [1, 2, 3]
    # wait=1 rejects i - last <= 1: from [1,2,3] only 1 and 3 survive
    got = peak_pick(x, pre_max=0, post_max=1, pre_avg=3, post_avg=4,
                    delta=0.07, wait=1)
    assert got.tolist() == [1, 3]
    # pre_max=1 -> window [i-1, i+1) = {x[i-1], x[i]}: x[2]=0.9 < x[1] fails
    got = peak_pick(x, pre_max=1, post_max=1, pre_avg=3, post_avg=4,
                    delta=0.07, wait=0)
    assert got.tolist() == [1, 3]


def test_onset_strength_center_compensation():
    """Centered STFT shifts energy by n_fft/(2*hop) frames; the envelope
    compensates with lag + n_fft//(2*hop) leading zeros, so a click at
    sample j lands near frame j/hop."""
    y = np.zeros(SR, np.float32)
    j = 8000
    y[j : j + 256] = 0.9
    env = onset_strength(y, sr=SR)
    peak_frame = int(np.argmax(env))
    # centered frames smear the click across +-n_fft/2 samples (2 frames)
    assert abs(peak_frame - j // 512) <= 3


def test_peak_pick_boundary_semantics_match_librosa_092():
    """Randomized equivalence vs a line-faithful scipy replication of
    librosa 0.9.2 ``util.peak_pick`` — including its explicit boundary
    loops, which overwrite ``uniform_filter1d(mode='nearest')``'s
    edge-replicated means with TRUNCATED-window means.  Pins that our
    truncated-window implementation matches at array edges too (the
    'nearest'-vs-truncated question raised in review is settled: librosa's
    final semantics are truncated)."""
    ndi = pytest.importorskip("scipy.ndimage")

    def librosa_092(x, pre_max, post_max, pre_avg, post_avg, delta, wait):
        x = np.asarray(x, np.float64)
        mov_max = ndi.maximum_filter1d(
            x, pre_max + post_max, mode="constant",
            origin=int(np.ceil(0.5 * (pre_max - post_max))), cval=x.min(),
        )
        mov_avg = ndi.uniform_filter1d(
            x, pre_avg + post_avg, mode="nearest",
            origin=int(np.ceil(0.5 * (pre_avg - post_avg))),
        )
        n = 0  # librosa's boundary corrections: truncated means
        while n - pre_avg < 0 and n < x.shape[0]:
            mov_avg[n] = np.mean(x[max(n - pre_avg, 0): n + post_avg])
            n += 1
        n = max(x.shape[0] - post_avg, 0)
        while n < x.shape[0]:
            mov_avg[n] = np.mean(x[max(n - pre_avg, 0): n + post_avg])
            n += 1
        det = x * (x == mov_max) * (x >= mov_avg + delta)
        peaks, last = [], -np.inf
        for i in np.nonzero(det)[0]:
            if i > last + wait:
                peaks.append(i)
                last = i
        return np.asarray(peaks, np.int64)

    rng = np.random.default_rng(0)
    for trial in range(300):
        x = np.abs(rng.normal(size=int(rng.integers(3, 120))))
        x /= x.max()
        # the two parameter sets the metrics use (sr=16000 / sr=22050)
        # plus a wider stress set
        for p in [(0, 1, 3, 4, 0.07, 0), (1, 1, 4, 5, 0.07, 1),
                  (3, 4, 10, 11, 0.07, 3)]:
            want = librosa_092(x, *p)
            got = peak_pick(x, *p)
            assert np.array_equal(want, got), (trial, p, want, got)
