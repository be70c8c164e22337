#!/usr/bin/env python3
"""Generate golden test vectors by running the reference xvc binaries.

Produces, for each config: input yuv, bitstream (length-prefixed NAL format),
and the reference-decoded yuv.  These are *generated data* used to verify the
bit-exactness of the TPU-native implementation against the reference codec
(divideon/xvc built from /root/reference).
"""
import os
import subprocess
import sys

import numpy as np

REF_ENC = "/tmp/refbuild/app/xvcenc"
REF_DEC = "/tmp/refbuild/app/xvcdec"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def synth_yuv420(width, height, frames, bitdepth=8, seed=7):
    """Deterministic synthetic video: gradients + moving pattern + noise."""
    rng = np.random.RandomState(seed)
    maxv = (1 << bitdepth) - 1
    ys, us, vs = [], [], []
    xx, yy = np.meshgrid(np.arange(width), np.arange(height))
    cw, ch = width // 2, height // 2
    cxx, cyy = np.meshgrid(np.arange(cw), np.arange(ch))
    for f in range(frames):
        y = (xx * 2 + yy * 3 + f * 5) % (maxv + 1)
        y = (0.6 * y + 0.4 * rng.randint(0, maxv + 1, (height, width)))
        circle = ((xx - (width // 2 + 3 * f)) ** 2 +
                  (yy - height // 2) ** 2) < (min(width, height) // 3) ** 2
        y = np.where(circle, maxv - y, y)
        u = (cxx * 3 + f * 2) % (maxv + 1) * 0.5 + (maxv + 1) * 0.25
        v = (cyy * 3 + 255 - f * 2) % (maxv + 1) * 0.5 + (maxv + 1) * 0.25
        ys.append(np.clip(y, 0, maxv))
        us.append(np.clip(u, 0, maxv))
        vs.append(np.clip(v, 0, maxv))
    dtype = np.uint8 if bitdepth == 8 else np.uint16
    chunks = []
    for f in range(frames):
        chunks.append(ys[f].astype(dtype).tobytes())
        chunks.append(us[f].astype(dtype).tobytes())
        chunks.append(vs[f].astype(dtype).tobytes())
    return b"".join(chunks)


def run(name, width, height, frames, qp=32, bitdepth=8, extra_enc=None):
    os.makedirs(OUT, exist_ok=True)
    yuv_path = os.path.join(OUT, f"{name}_in.yuv")
    bs_path = os.path.join(OUT, f"{name}.xvc")
    dec_path = os.path.join(OUT, f"{name}_dec.yuv")
    rec_path = os.path.join(OUT, f"{name}_rec.yuv")
    with open(yuv_path, "wb") as f:
        f.write(synth_yuv420(width, height, frames, bitdepth))
    enc_cmd = [
        REF_ENC, "-input-file", yuv_path, "-output-file", bs_path,
        "-input-width", str(width), "-input-height", str(height),
        "-input-bitdepth", str(bitdepth), "-internal-bitdepth", str(bitdepth),
        "-qp", str(qp), "-checksum-mode", "1", "-rec-file", rec_path,
        "-verbose", "1",
    ] + (extra_enc or [])
    r = subprocess.run(enc_cmd, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout, r.stderr)
        raise RuntimeError(f"encode failed for {name}")
    dec_cmd = [REF_DEC, "-bitstream-file", bs_path, "-output-file", dec_path]
    r2 = subprocess.run(dec_cmd, capture_output=True, text=True)
    if r2.returncode != 0:
        print(r2.stdout, r2.stderr)
        raise RuntimeError(f"decode failed for {name}")
    print(f"{name}: bs={os.path.getsize(bs_path)}B")
    with open(os.path.join(OUT, f"{name}.meta"), "w") as f:
        f.write(f"width={width}\nheight={height}\nframes={frames}\n"
                f"qp={qp}\nbitdepth={bitdepth}\n")


def main():
    ai = ["-sub-gop-length", "1", "-num-ref-pics", "0"]
    # All-intra tiny: primary bring-up vector
    run("ai16x16", 16, 16, 2, qp=32, extra_enc=ai)
    # All-intra small multi-CTU
    run("ai64x48", 64, 48, 3, qp=32, extra_enc=ai)
    # All-intra at different qp (context init per qp)
    run("ai64x48q27", 64, 48, 2, qp=27, extra_enc=ai)
    run("ai64x48q37", 64, 48, 2, qp=37, extra_enc=ai)
    # Odd size (implicit split + padding)
    run("ai44x36", 44, 36, 2, qp=32, extra_enc=ai)
    # 10-bit
    run("ai64x48b10", 64, 48, 2, qp=32, bitdepth=10, extra_enc=ai)
    # CIF-size all intra (config 1 in BASELINE.md)
    run("ai352x288", 352, 288, 2, qp=32, extra_enc=ai)
    # Inter low-delay P
    run("ld64x48", 64, 48, 8, qp=32,
        extra_enc=["-sub-gop-length", "1", "-num-ref-pics", "1",
                   "-low-delay", "1"])
    # Random-access hierarchical sub-gop
    run("ra64x48", 64, 48, 10, qp=32,
        extra_enc=["-sub-gop-length", "8", "-num-ref-pics", "2"])
    print("done")


if __name__ == "__main__":
    sys.exit(main())
