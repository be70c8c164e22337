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


def make_output_conversion_vectors():
    """Reference xvcdec -output-* goldens over ai64x48 (simd off for the
    dither vector: the reference SSE2 dither kernel uses lane-wise error
    accumulators and diverges from its own scalar code)."""
    cases = [
        ("down32x24", ["-output-width", "32", "-output-height", "24"]),
        ("up128x96", ["-output-width", "128", "-output-height", "96"]),
        ("chroma444", ["-output-chroma-format", "3"]),
        ("mono", ["-output-chroma-format", "0"]),
        ("bd10", ["-output-bitdepth", "10"]),
        ("down44x36", ["-output-width", "44", "-output-height", "36"]),
        ("argb", ["-output-chroma-format", "4", "-simd-mask", "0"]),
        ("argb601", ["-output-chroma-format", "4",
                     "-output-color-matrix", "1", "-simd-mask", "0"]),
    ]
    for tag, args in cases:
        subprocess.run([REF_DEC, "-bitstream-file",
                        os.path.join(OUT, "ai64x48.xvc"), "-output-file",
                        os.path.join(OUT, f"ai64x48_out_{tag}.yuv")] + args,
                       check=True, capture_output=True)
    subprocess.run([REF_DEC, "-bitstream-file",
                    os.path.join(OUT, "ai64x48b10.xvc"), "-output-file",
                    os.path.join(OUT, "ai64x48b10_out_dither8.yuv"),
                    "-output-bitdepth", "8", "-dither", "1",
                    "-simd-mask", "0"], check=True, capture_output=True)
    subprocess.run([REF_DEC, "-bitstream-file",
                    os.path.join(OUT, "ra64x48.xvc"), "-output-file",
                    os.path.join(OUT, "ra64x48_fps15.yuv"),
                    "-max-framerate", "15", "-simd-mask", "0"],
                   check=True, capture_output=True)


def make_scalability_vector():
    """Spliced two-resolution open-gop stream + reference decode
    (mirrors test/xvc_test/decoder_scalability_test.cc:84-117)."""
    def enc(name, w, h, frames):
        yuv = os.path.join(OUT, f"{name}_in.yuv")
        bs = os.path.join(OUT, f"{name}.xvc")
        with open(yuv, "wb") as f:
            f.write(synth_yuv420(w, h, frames, 8))
        subprocess.run([REF_ENC, "-input-file", yuv, "-output-file", bs,
                        "-input-width", str(w), "-input-height", str(h),
                        "-qp", "32", "-checksum-mode", "1",
                        "-sub-gop-length", "4", "-max-keypic-distance", "8",
                        "-num-ref-pics", "2"], check=True,
                       capture_output=True)
        return bs

    def read_nals(path):
        data = open(path, "rb").read()
        nals, off = [], 0
        while off < len(data):
            ln = int.from_bytes(data[off:off + 4], "little")
            off += 4
            nals.append(data[off:off + ln])
            off += ln
        return nals

    def is_seg_header(nal):
        return ((nal[0] >> 1) & 31) == 16  # kSegmentHeader

    bs1 = enc("_tmp_scal16", 16, 16, 17)
    bs2 = enc("_tmp_scal24", 24, 24, 17)
    n1, n2 = read_nals(bs1), read_nals(bs2)
    i1 = next(i for i in range(1, len(n1)) if is_seg_header(n1[i]))
    i2 = next(i for i in range(1, len(n2)) if is_seg_header(n2[i]))
    merged = n1[:i1] + n2[i2:]
    with open(os.path.join(OUT, "scal16to24.xvc"), "wb") as f:
        for nal in merged:
            f.write(len(nal).to_bytes(4, "little"))
            f.write(nal)
    subprocess.run([REF_DEC, "-bitstream-file",
                    os.path.join(OUT, "scal16to24.xvc"), "-output-file",
                    os.path.join(OUT, "scal16to24_dec.yuv"),
                    "-simd-mask", "0"], check=True, capture_output=True)
    for p in (bs1, bs2, os.path.join(OUT, "_tmp_scal16_in.yuv"),
              os.path.join(OUT, "_tmp_scal24_in.yuv")):
        if os.path.exists(p):
            os.remove(p)


def make_restricted_mode_vectors():
    """Reference streams for restricted modes A-D
    (ref: restrictions.cc:340-470)."""
    for m in (1, 2, 3, 4):
        bs = os.path.join(OUT, f"rm{m}_64x48.xvc")
        subprocess.run([REF_ENC, "-input-file",
                        os.path.join(OUT, "ai64x48_in.yuv"),
                        "-output-file", bs,
                        "-input-width", "64", "-input-height", "48",
                        "-input-bitdepth", "8", "-internal-bitdepth", "8",
                        "-qp", "32", "-checksum-mode", "1",
                        "-restricted-mode", str(m),
                        "-sub-gop-length", "4", "-num-ref-pics", "2"],
                       check=True, capture_output=True)
        subprocess.run([REF_DEC, "-bitstream-file", bs, "-output-file",
                        os.path.join(OUT, f"rm{m}_64x48_dec.yuv"),
                        "-simd-mask", "0"], check=True, capture_output=True)


def make_speed_mode_vectors():
    """Speed/tune/checksum-mode/leading-pictures variants on 48x32
    (ref: encoder_settings.cc:29-73)."""
    yuv = os.path.join(OUT, "sp48x32_in.yuv")
    with open(yuv, "wb") as f:
        f.write(synth_yuv420(48, 32, 6, 8))
    base = [REF_ENC, "-input-file", yuv, "-input-width", "48",
            "-input-height", "32", "-input-bitdepth", "8",
            "-internal-bitdepth", "8", "-qp", "32", "-sub-gop-length", "4"]
    cases = [
        ("sp_placebo", ["-speed-mode", "0", "-checksum-mode", "1"]),
        ("sp_fast", ["-speed-mode", "2", "-checksum-mode", "1"]),
        ("sp_tunepsnr", ["-tune", "1", "-checksum-mode", "1"]),
        ("sp_cksum0", []),
        ("sp_leadpics", ["-checksum-mode", "1",
                         "-explicit-encoder-settings", "leading_pictures 1"]),
    ]
    for tag, extra in cases:
        bs = os.path.join(OUT, f"{tag}.xvc")
        subprocess.run(base + ["-output-file", bs] + extra, check=True,
                       capture_output=True)
        subprocess.run([REF_DEC, "-bitstream-file", bs, "-output-file",
                        os.path.join(OUT, f"{tag}_dec.yuv"),
                        "-simd-mask", "0"], check=True, capture_output=True)


def make_chroma_format_vectors():
    """Monochrome / 422 / 444 vectors (ref: yuv_pic.cc)."""
    import numpy as np
    w, h, frames = 32, 32, 2
    rng = np.random.RandomState(11)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    for cf, tag in ((0, "mono"), (2, "c422"), (3, "c444")):
        chunks = []
        for f in range(frames):
            y = ((xx * 3 + yy * 2 + f * 7) % 256 * 0.6 +
                 0.4 * rng.randint(0, 256, (h, w))).clip(0, 255) \
                .astype(np.uint8)
            chunks.append(y.tobytes())
            if cf != 0:
                cw = w if cf == 3 else w // 2
                ch = h if cf >= 2 else h // 2
                u = ((xx[:ch, :cw] * 2 + f * 3) % 200 + 28).astype(np.uint8)
                v = ((yy[:ch, :cw] * 3 + 255 - f) % 200 + 28) \
                    .astype(np.uint8)
                chunks += [u.tobytes(), v.tobytes()]
        yuv = os.path.join(OUT, f"cf_{tag}_in.yuv")
        open(yuv, "wb").write(b"".join(chunks))
        bs = os.path.join(OUT, f"cf_{tag}.xvc")
        subprocess.run([REF_ENC, "-input-file", yuv, "-output-file", bs,
                        "-input-width", str(w), "-input-height", str(h),
                        "-input-bitdepth", "8", "-internal-bitdepth", "8",
                        "-input-chroma-format", str(cf), "-qp", "32",
                        "-checksum-mode", "1", "-sub-gop-length", "1",
                        "-num-ref-pics", "1"], check=True,
                       capture_output=True)
        subprocess.run([REF_DEC, "-bitstream-file", bs, "-output-file",
                        os.path.join(OUT, f"cf_{tag}_dec.yuv"),
                        "-simd-mask", "0"], check=True, capture_output=True)


def make_resolution_vectors():
    """Odd-size vectors (implicit split + crop; resolution_test.cc)."""
    for w, h in ((24, 16), (16, 24), (44, 20), (20, 36)):
        tag = f"res{w}x{h}"
        yuv = os.path.join(OUT, f"{tag}_in.yuv")
        open(yuv, "wb").write(synth_yuv420(w, h, 2, 8))
        bs = os.path.join(OUT, f"{tag}.xvc")
        subprocess.run([REF_ENC, "-input-file", yuv, "-output-file", bs,
                        "-input-width", str(w), "-input-height", str(h),
                        "-input-bitdepth", "8", "-internal-bitdepth", "8",
                        "-qp", "30", "-checksum-mode", "1",
                        "-sub-gop-length", "1", "-num-ref-pics", "1"],
                       check=True, capture_output=True)
        subprocess.run([REF_DEC, "-bitstream-file", bs, "-output-file",
                        os.path.join(OUT, f"{tag}_dec.yuv"),
                        "-simd-mask", "0"], check=True, capture_output=True)


def make_bitdepth_encapsulation_vectors():
    """12-bit coding + encapsulation-mode vectors."""
    open(os.path.join(OUT, "b12_in.yuv"), "wb").write(
        synth_yuv420(32, 32, 2, 12))
    subprocess.run([REF_ENC, "-input-file", os.path.join(OUT, "b12_in.yuv"),
                    "-output-file", os.path.join(OUT, "b12.xvc"),
                    "-input-width", "32", "-input-height", "32",
                    "-input-bitdepth", "12", "-internal-bitdepth", "12",
                    "-qp", "32", "-checksum-mode", "1",
                    "-sub-gop-length", "1", "-num-ref-pics", "0"],
                   check=True, capture_output=True)
    subprocess.run([REF_DEC, "-bitstream-file", os.path.join(OUT, "b12.xvc"),
                    "-output-file", os.path.join(OUT, "b12_dec.yuv"),
                    "-simd-mask", "0"], check=True, capture_output=True)
    subprocess.run([REF_ENC, "-input-file",
                    os.path.join(OUT, "ai64x48_in.yuv"), "-output-file",
                    os.path.join(OUT, "enc_encap.xvc"),
                    "-input-width", "64", "-input-height", "48",
                    "-input-bitdepth", "8", "-internal-bitdepth", "8",
                    "-qp", "32", "-checksum-mode", "1", "-sub-gop-length",
                    "1", "-num-ref-pics", "0",
                    "-explicit-encoder-settings", "encapsulation_mode 1"],
                   check=True, capture_output=True)
    subprocess.run([REF_DEC, "-bitstream-file",
                    os.path.join(OUT, "enc_encap.xvc"), "-output-file",
                    os.path.join(OUT, "enc_encap_dec.yuv"),
                    "-simd-mask", "0"], check=True, capture_output=True)


def make_closed_gop_vector():
    subprocess.run([REF_ENC, "-input-file",
                    os.path.join(OUT, "sp48x32_in.yuv"), "-output-file",
                    os.path.join(OUT, "cg48x32.xvc"), "-input-width", "48",
                    "-input-height", "32", "-input-bitdepth", "8",
                    "-internal-bitdepth", "8", "-qp", "32", "-checksum-mode",
                    "1", "-sub-gop-length", "2", "-max-keypic-distance", "2",
                    "-closed-gop", "1", "-num-ref-pics", "1"], check=True,
                   capture_output=True)
    subprocess.run([REF_DEC, "-bitstream-file",
                    os.path.join(OUT, "cg48x32.xvc"), "-output-file",
                    os.path.join(OUT, "cg48x32_dec.yuv"), "-simd-mask", "0"],
                   check=True, capture_output=True)


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
    make_output_conversion_vectors()
    make_scalability_vector()
    make_restricted_mode_vectors()
    make_speed_mode_vectors()
    make_chroma_format_vectors()
    make_resolution_vectors()
    make_bitdepth_encapsulation_vectors()
    make_closed_gop_vector()
    print("done")


if __name__ == "__main__":
    sys.exit(main())
