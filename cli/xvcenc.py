#!/usr/bin/env python3
"""xvcenc-compatible encoder app.

Accepts the reference encoder app's arguments
(ref: app/xvc_enc_app/encoder_app.cc) and produces identical bitstreams.
"""
import argparse
import struct
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from xvc_tpu import constants as k  # noqa: E402
from xvc_tpu.api import EncoderParameters, EncoderSession  # noqa: E402


def make_parser():
    p = argparse.ArgumentParser(prog="xvcenc", add_help=False,
                                prefix_chars="-")
    a = p.add_argument
    a("-h", action="help")
    a("-input-file", required=True)
    a("-output-file", required=True)
    a("-rec-file", default=None)
    a("-input-width", type=int, default=0)
    a("-input-height", type=int, default=0)
    a("-input-chroma-format", type=int, default=1)
    a("-input-color-matrix", type=int, default=0)
    a("-input-bitdepth", type=int, default=8)
    a("-internal-bitdepth", type=int, default=None)
    a("-framerate", type=float, default=60)
    a("-skip-pictures", type=int, default=0)
    a("-temporal-subsample", type=int, default=1)
    a("-max-pictures", type=int, default=-1)
    a("-sub-gop-length", type=int, default=0)
    a("-max-keypic-distance", type=int, default=640)
    a("-closed-gop", type=int, default=0)
    a("-low-delay", type=int, default=0)
    a("-num-ref-pics", type=int, default=-1)
    a("-restricted-mode", type=int, default=0)
    a("-checksum-mode", type=int, default=0)
    a("-chroma-qp-offset-table", type=int, default=0)
    a("-chroma-qp-offset-u", type=int, default=0)
    a("-chroma-qp-offset-v", type=int, default=0)
    a("-deblock", type=int, default=1)
    a("-beta-offset", type=int, default=0)
    a("-tc-offset", type=int, default=0)
    a("-qp", type=int, default=32)
    a("-flat-lambda", type=int, default=0)
    a("-speed-mode", type=int, default=-1)
    a("-tune", type=int, default=0)
    a("-threads", type=int, default=0)       # accepted, single-threaded
    a("-simd-mask", type=int, default=None)  # accepted, no-op (TPU path)
    a("-explicit-encoder-settings", default="")
    a("-verbose", type=int, default=0)
    return p


def main(argv=None):
    args = vars(make_parser().parse_args(argv))
    g = lambda name: args[name.replace("-", "_")]  # noqa: E731
    width, height = g("input-width"), g("input-height")
    bitdepth = g("input-bitdepth")
    chroma = g("input-chroma-format")
    framerate = g("framerate")

    infile = sys.stdin.buffer if g("input-file") == "-" \
        else open(g("input-file"), "rb")
    from y4m import Y4mReader
    y4m = Y4mReader(infile)
    leftover = y4m.read_header(infile.read(10))
    if y4m.is_y4m:
        width, height = y4m.width, y4m.height
        bitdepth = y4m.bitdepth
        chroma = y4m.chroma_format
        if y4m.framerate:
            framerate = y4m.framerate
    internal = g("internal-bitdepth") or bitdepth
    params = EncoderParameters(
        width=width, height=height, chroma_format=chroma,
        color_matrix=g("input-color-matrix"), input_bitdepth=bitdepth,
        internal_bitdepth=internal, framerate=framerate,
        sub_gop_length=g("sub-gop-length"),
        max_keypic_distance=g("max-keypic-distance"),
        closed_gop=g("closed-gop"), low_delay=g("low-delay"),
        num_ref_pics=g("num-ref-pics"),
        restricted_mode=g("restricted-mode"),
        checksum_mode=g("checksum-mode"),
        chroma_qp_offset_table=g("chroma-qp-offset-table"),
        chroma_qp_offset_u=g("chroma-qp-offset-u"),
        chroma_qp_offset_v=g("chroma-qp-offset-v"),
        deblock=g("deblock"), beta_offset=g("beta-offset"),
        tc_offset=g("tc-offset"), qp=g("qp"),
        flat_lambda=g("flat-lambda"), speed_mode=g("speed-mode"),
        tune_mode=g("tune"), threads=g("threads"),
        explicit_encoder_settings=g("explicit-encoder-settings"))
    session = EncoderSession(params)

    sample_bytes = 1 if bitdepth <= 8 else 2
    if chroma == k.ChromaFormat.MONOCHROME:
        pic_samples = width * height
    elif chroma == k.ChromaFormat.YUV422:
        pic_samples = width * height * 2
    elif chroma == k.ChromaFormat.YUV444:
        pic_samples = width * height * 3
    else:
        pic_samples = width * height * 3 // 2
    frame_size = pic_samples * sample_bytes

    out = open(g("output-file"), "wb")
    rec_out = open(g("rec-file"), "wb") if g("rec-file") else None

    def read_frame():
        nonlocal leftover
        if y4m.is_y4m:
            leftover = y4m.skip_frame_header(leftover)
        need = frame_size
        chunks = []
        if leftover:
            take = leftover[:need]
            chunks.append(take)
            leftover = leftover[len(take):]
            need -= len(take)
        if need:
            chunks.append(infile.read(need))
        return b"".join(chunks)

    def drain_rec():
        if rec_out is not None:
            for rec in session.rec_pictures:
                rec_out.write(rec)
            session.rec_pictures.clear()
    total_nals = 0
    total_bytes = 0
    start = time.time()
    picture_index = 0
    encoded = 0
    max_pics = g("max-pictures")
    skip = g("skip-pictures")
    subsample = max(1, g("temporal-subsample"))
    for _ in range(skip):
        read_frame()
    while max_pics < 0 or encoded < max_pics:
        data = read_frame()
        if len(data) < frame_size:
            break
        if picture_index % subsample:
            picture_index += 1
            continue
        picture_index += 1
        for nal in session.encode(data):
            out.write(struct.pack("<I", len(nal)))
            out.write(nal)
            total_nals += 1
            total_bytes += len(nal)
        drain_rec()
        encoded += 1
    for nal in session.flush():
        out.write(struct.pack("<I", len(nal)))
        out.write(nal)
        total_nals += 1
        total_bytes += len(nal)
    drain_rec()
    out.close()
    if rec_out is not None:
        rec_out.close()
    if infile is not sys.stdin.buffer:
        infile.close()
    dt = time.time() - start
    print(f"Encoded:     {encoded} pictures")
    print(f"Total time:  {dt:.2f} s")
    print(f"Bytes:       {total_bytes} ({total_nals} nal units)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
