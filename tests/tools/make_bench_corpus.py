#!/usr/bin/env python3
"""Generate the varied bench corpus (tests/data/bench/*.ogg).

Encodes deterministic synthetic audio through the *system* libvorbisenc
(tests/tools/vorbis_oracle.py), producing a corpus that exercises what a
single duplicated test file cannot: a long (>=60 s) stream, mono/stereo/5.1
channel topologies, low and high bitrates, low sample rates (different
blocksize pairs), and transient-heavy material (forces short blocks).

Run from the repo root:  python3 tests/tools/make_bench_corpus.py
Deterministic: fixed RNG seeds, fixed encoder settings; the generated files
are committed so the bench never depends on this script at run time.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       os.pardir, "data", "bench")


def _envelope(n, rate, attack=0.01, release=0.1):
    env = np.ones(n, np.float32)
    a = min(n, max(1, int(attack * rate)))
    r = min(n, max(1, int(release * rate)))
    env[:a] = np.linspace(0, 1, a)
    env[-r:] *= np.linspace(1, 0, r)
    return env


def music(seconds, rate, channels, seed, transient_rate=0.5):
    """Deterministic music-like signal: note sequence of detuned harmonic
    stacks + noise floor + percussive clicks (transients force short
    blocks in the encoder)."""
    rng = np.random.RandomState(seed)
    n = int(seconds * rate)
    t = np.arange(n) / rate
    out = np.zeros((channels, n), np.float32)
    # notes: ~2.5 per second, pentatonic-ish grid
    freqs = 110.0 * 2 ** (np.array([0, 3, 5, 7, 10, 12, 15]) / 12.0)
    pos = 0
    while pos < n:
        dur = int(rate * rng.uniform(0.25, 0.7))
        dur = min(dur, n - pos)
        f0 = float(rng.choice(freqs)) * 2 ** rng.randint(0, 3)
        seg_t = t[pos:pos + dur]
        env = _envelope(dur, rate)
        for ch in range(channels):
            detune = 1.0 + 0.001 * (ch - channels / 2) + 0.0005 * rng.randn()
            sig = np.zeros(dur, np.float32)
            for h, amp in ((1, 0.5), (2, 0.25), (3, 0.12), (5, 0.06)):
                ph = rng.uniform(0, 2 * np.pi)
                sig += amp * np.sin(2 * np.pi * f0 * detune * h * seg_t + ph)
            out[ch, pos:pos + dur] += (env * sig).astype(np.float32)
        pos += dur
    # noise floor + percussion clicks
    out += 0.01 * rng.randn(channels, n).astype(np.float32)
    n_clicks = int(seconds * transient_rate)
    for _ in range(n_clicks):
        at = rng.randint(0, max(1, n - rate // 8))
        dur = rate // 50
        click = (rng.randn(dur) * np.exp(-np.arange(dur) / (dur / 6.0)))
        out[:, at:at + dur] += 0.8 * click[None, :].astype(np.float32)
    peak = np.abs(out).max()
    return (0.6 * out / max(peak, 1e-9)).astype(np.float32)


def speechish(seconds, rate, seed):
    """Mono speech-like: pitch-modulated pulse train through moving
    formant-ish resonances, with pauses."""
    rng = np.random.RandomState(seed)
    n = int(seconds * rate)
    t = np.arange(n) / rate
    pitch = 120 + 30 * np.sin(2 * np.pi * 2.3 * t) + 10 * rng.randn()
    phase = np.cumsum(pitch / rate)
    sig = ((phase % 1.0) < 0.1).astype(np.float32) - 0.05
    # crude moving resonance: time-varying comb of sines
    f1 = 500 + 300 * np.sin(2 * np.pi * 0.7 * t)
    f2 = 1500 + 700 * np.sin(2 * np.pi * 0.41 * t + 1)
    sig = sig * (np.sin(2 * np.pi * f1 * t) + 0.5 * np.sin(2 * np.pi * f2 * t))
    # syllable gating
    gate = (np.sin(2 * np.pi * 3.1 * t) > -0.3).astype(np.float32)
    sig = sig * gate + 0.005 * rng.randn(n).astype(np.float32)
    sig = 0.5 * sig / max(np.abs(sig).max(), 1e-9)
    return sig[None, :].astype(np.float32)


CORPUS = [
    # (name, synth fn -> [C, N] f32, rate, vbr quality)
    ("long64s.stereo.44k.q3.ogg",
     lambda: music(64.0, 44100, 2, seed=1), 44100, 0.3),
    ("music8s.stereo.44k.q8.ogg",
     lambda: music(8.0, 44100, 2, seed=2), 44100, 0.8),
    ("transient4s.stereo.44k.q2.ogg",
     lambda: music(4.0, 44100, 2, seed=3, transient_rate=12.0), 44100, 0.2),
    ("speech8s.mono.44k.q1.ogg",
     lambda: speechish(8.0, 44100, seed=4), 44100, 0.1),
    ("speech64s.mono.44k.q2.ogg",
     lambda: speechish(64.0, 44100, seed=8), 44100, 0.2),
    ("surround6s.5_1.44k.q4.ogg",
     lambda: music(6.0, 44100, 6, seed=5), 44100, 0.4),
    ("lowrate8s.mono.8k.q_1.ogg",
     lambda: speechish(8.0, 8000, seed=6), 8000, -0.1),
    ("midrate8s.stereo.16k.q0.ogg",
     lambda: music(8.0, 16000, 2, seed=7), 16000, 0.0),
]


def main():
    from vorbis_oracle import encode_ogg

    os.makedirs(OUT_DIR, exist_ok=True)
    for name, synth, rate, q in CORPUS:
        path = os.path.join(OUT_DIR, name)
        pcm = synth()
        data = encode_ogg(pcm, rate, q)
        with open(path, "wb") as f:
            f.write(data)
        secs = pcm.shape[1] / rate
        print("%-36s %7.2fs %dch %6dHz q%+.1f -> %7d bytes (%5.1f kbit/s)"
              % (name, secs, pcm.shape[0], rate, q, len(data),
                 len(data) * 8 / secs / 1000))


if __name__ == "__main__":
    main()
