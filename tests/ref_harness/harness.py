"""Build & run the unmodified reference simulator as a golden-IQ oracle.

Compiles /root/reference/plutogpssim.c (read-only mount) against the stub
iio/ad9361/curl headers+implementations in this directory, so the
program's SDR TX thread writes its int16 IQ buffers to a capture file
instead of USB hardware.  The reference source is never modified or
copied — this is a link-time test fixture giving true A/B ground truth.

Capture post-processing: the producer/TX handshake can push all-zero
buffers before the first fill and (rarely) push the same filled buffer
twice; `load_capture` strips leading zero-buffers and consecutive exact
duplicates (a real composite GPS block never repeats exactly).
"""

from __future__ import annotations

import os
import subprocess

import numpy as np

REF_SRC = "/root/reference/plutogpssim.c"
HARNESS_DIR = os.path.dirname(os.path.abspath(__file__))
NUM_SAMPLES = 300_000  # compile-time constant in the reference (c:44)


def reference_available() -> bool:
    return os.path.exists(REF_SRC)


def build_oracle(out_dir: str) -> str:
    """Compile the reference + stubs; returns path to the binary."""
    exe = os.path.join(out_dir, "ref_oracle")
    if os.path.exists(exe):
        return exe
    os.makedirs(out_dir, exist_ok=True)
    cmd = [
        "gcc", "-O2", "-std=gnu11", "-D_GNU_SOURCE", "-include", "limits.h",
        "-I", HARNESS_DIR,
        REF_SRC,
        os.path.join(HARNESS_DIR, "stubs.c"),
        "-o", exe,
        "-lm", "-lpthread", "-lz",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return exe


def run_oracle(exe: str, nav_file: str, capture_file: str, n_buffers: int,
               extra_args: list[str] | None = None,
               push_sleep_ms: int = 60, timeout: float = 300.0) -> str:
    """Run the oracle for n_buffers 300k-sample blocks; returns stderr."""
    env = dict(os.environ)
    env["REF_CAPTURE_FILE"] = capture_file
    env["REF_CAPTURE_BUFFERS"] = str(n_buffers)
    env["REF_PUSH_SLEEP_MS"] = str(push_sleep_ms)
    args = [exe, "-e", nav_file] + (extra_args or [])
    proc = subprocess.run(args, env=env, capture_output=True, text=True,
                          timeout=timeout)
    return proc.stderr


def load_capture(capture_file: str) -> np.ndarray:
    """Load capture -> int16 [n_blocks, NUM_SAMPLES, 2], cleaned."""
    raw = np.fromfile(capture_file, dtype=np.int16)
    n_blocks = len(raw) // (NUM_SAMPLES * 2)
    blocks = raw[: n_blocks * NUM_SAMPLES * 2].reshape(n_blocks, NUM_SAMPLES, 2)

    keep = []
    prev = None
    for b in blocks:
        if not keep and not b.any():
            continue  # leading zero buffer (TX copied before first fill)
        if prev is not None and np.array_equal(b, prev):
            continue  # duplicate push (producer hiccup)
        keep.append(b)
        prev = b
    if not keep:
        return np.empty((0, NUM_SAMPLES, 2), dtype=np.int16)
    return np.stack(keep)
