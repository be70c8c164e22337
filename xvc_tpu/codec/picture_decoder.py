"""Per-picture decoding: header parse, CTU loop, deblock, checksum.

Behavioral equivalent of the reference picture decoder
(ref: src/xvc_dec_lib/picture_decoder.cc).
"""
from dataclasses import dataclass

from .. import constants as k
from .. import segment as seg
from ..ops.deblock import DeblockingFilter
from ..ops.quant import Qp
from ..syntax.reader import SyntaxReader
from . import checksum as cksum
from . import output
from .cu import PictureData, ReferencePictureLists
from .cu_decoder import CuDecoder
from .yuv import YuvPicture


@dataclass
class PicNalHeader:
    nal_unit_type: int = 0
    soc: int = 0
    poc: int = 0
    doc: int = 0
    tid: int = 0
    pic_qp: int = 0
    highest_layer: bool = False
    deblock: bool = True
    allow_lic: bool = False


def decode_header(segment_header, bit_reader, state, prev_sub_gop_length,
                  doc, soc_counter, num_buffered_nals, restrictions):
    """Reconstruct POC/DOC/TID from the picture NAL header.

    state: dict with keys sub_gop_end_poc, sub_gop_start_poc,
    sub_gop_length (mutated).  (ref: picture_decoder.cc:52-141)
    """
    header_byte = bit_reader.read_bits(8)
    nal_unit_type = k.NalUnitType((header_byte >> 1) & 31)
    buffer_flag = bit_reader.read_bits(1)
    soc = (soc_counter - 1) & 0xFF if buffer_flag else soc_counter
    tid = bit_reader.read_bits(3)
    if nal_unit_type == k.NalUnitType.INTRA_ACCESS_PICTURE and \
            segment_header.leading_pictures:
        state["sub_gop_length"] = segment_header.max_sub_gop_length
        state["sub_gop_start_poc"] += k.MAX_SUB_GOP_LENGTH if doc > 1 else 0
        state["sub_gop_end_poc"] = state["sub_gop_start_poc"]
    elif tid == 0:
        length = segment_header.max_sub_gop_length
        if num_buffered_nals:
            state["sub_gop_length"] = prev_sub_gop_length
        elif nal_unit_type == k.NalUnitType.INTRA_ACCESS_PICTURE:
            state["sub_gop_length"] = 1
        elif length > 0:
            state["sub_gop_length"] = length
        elif doc > 0:
            state["sub_gop_length"] = 1
        state["sub_gop_start_poc"] = state["sub_gop_end_poc"]
    elif segment_header.max_sub_gop_length > state["sub_gop_length"]:
        state["sub_gop_length"] = segment_header.max_sub_gop_length
    pic_qp = bit_reader.read_bits(7) - k.QP_SIGNAL_BASE
    allow_lic = False
    if not restrictions.disable_ext2_inter_local_illumination_comp:
        allow_lic = bit_reader.read_bit() != 0
    deblock = segment_header.deblocking_mode != k.DeblockingMode.DISABLED
    if segment_header.deblocking_mode == k.DeblockingMode.PER_PICTURE:
        deblock = bit_reader.read_bit() != 0
    bit_reader.skip_bits()

    if doc > state["sub_gop_end_poc"]:
        state["sub_gop_start_poc"] = state["sub_gop_end_poc"]
    while doc > state["sub_gop_start_poc"] + state["sub_gop_length"]:
        state["sub_gop_start_poc"] += state["sub_gop_length"]
    if doc > 0 and doc <= state["sub_gop_start_poc"]:
        doc = state["sub_gop_start_poc"] + 1
    # Bounded tid resync: the reference loop (picture_decoder.cc:111-118)
    # is unbounded and spins forever on a corrupt tid; valid resync
    # (dropped temporal layers / truncated sub-GOPs) converges within a
    # sub-GOP span, so cap the walk and reject the NAL beyond it.
    resync_cap = 4 * k.MAX_SUB_GOP_LENGTH + 16
    while not segment_header.low_delay and \
            seg.calc_tid_from_doc(doc, state["sub_gop_length"],
                                  state["sub_gop_start_poc"]) != tid:
        doc += 1
        if doc > state["sub_gop_end_poc"]:
            state["sub_gop_start_poc"] = state["sub_gop_end_poc"]
        resync_cap -= 1
        if resync_cap <= 0:
            raise ValueError("unresolvable tid in picture header")
    if tid == 0:
        state["sub_gop_end_poc"] = seg.calc_poc_from_doc(
            doc, state["sub_gop_length"], state["sub_gop_start_poc"])
    poc = seg.calc_poc_from_doc(doc, state["sub_gop_length"],
                                state["sub_gop_start_poc"])
    if segment_header.low_delay:
        poc = doc
    return PicNalHeader(
        nal_unit_type=nal_unit_type, soc=soc, poc=poc, doc=doc, tid=tid,
        pic_qp=pic_qp,
        highest_layer=(tid == seg.get_max_tid(state["sub_gop_length"])),
        deblock=deblock, allow_lic=allow_lic)


class PictureDecoder:
    """Holds reconstruction state for one picture; recycled via the pool."""

    def __init__(self, pic_format_chroma, width, height, bitdepth,
                 crop_width=0, crop_height=0):
        self.pic_data = PictureData(pic_format_chroma, width, height,
                                    bitdepth)
        self.rec_pic = YuvPicture(pic_format_chroma, width, height, bitdepth,
                                  True, crop_width, crop_height)
        self.alt_rec_pic = None
        self.output_status_done = True  # has been output
        self.ref_count = 0
        self.pic_qp = 0
        self.output_format = None
        self.user_data = 0
        self.is_conforming = True
        self.output_pic_bytes = b""
        self.pic_hash = b""
        self._post_finish = None  # deferred checksum/output join

    def get_alternative_rec_pic(self, segment_header):
        """Allocate (but do not fill) the cross-segment alternative
        reconstruction; content is produced by the picture's own decode
        via generate_alternative_rec_pic, exactly like the reference so
        reference-list preparation stays thread-safe
        (ref: picture_decoder.cc:226-241)."""
        if self.alt_rec_pic is not None:
            return self.alt_rec_pic
        sh = segment_header
        self.alt_rec_pic = YuvPicture(sh.chroma_format, sh.internal_width,
                                      sh.internal_height,
                                      sh.internal_bitdepth, True,
                                      sh.crop_width, sh.crop_height)
        return self.alt_rec_pic

    def generate_alternative_rec_pic(self, segment_header):
        """Fill the alternative reconstruction by rescaling rec_pic
        (ref: picture_decoder.cc:242-293)."""
        from ..ops import resample
        alt = self.get_alternative_rec_pic(segment_header)
        for c in range(k.num_components(segment_header.chroma_format)):
            if (self.rec_pic.chroma_format == k.ChromaFormat.MONOCHROME
                    and c != 0):
                alt.plane_view(c)[:] = 1 << (alt.bitdepth - 1)
                continue
            resample.resample_pic_plane(alt, c, self.rec_pic)
        alt.pad_border()
        return alt

    def init_pic(self, segment, header, ref_pic_list, output_pic_format,
                 user_data):
        self.pic_qp = header.pic_qp
        self.output_format = output_pic_format
        self.user_data = user_data
        self.output_status_done = False
        self.ref_count = 0
        self.alt_rec_pic = None
        self.rec_pic._dev_planes = None  # invalidate device ref cache
        self.rec_pic._dev_pre_deblock = None
        if getattr(self.rec_pic, "_dev_slots", None):
            from ..tpu.flat_recon import release_slot
            release_slot(self.rec_pic)  # buffer recycled: free DPB slots
        self.rec_pic.invalidate_shadow16()  # buffer recycled
        pd = self.pic_data
        pd.nal_type = header.nal_unit_type
        pd.soc = header.soc
        pd.poc = header.poc
        pd.doc = header.doc
        pd.tid = header.tid
        pd.sub_gop_length = segment.max_sub_gop_length
        pd.highest_layer = header.highest_layer and not segment.low_delay
        pd.adaptive_qp = segment.adaptive_qp
        pd.deblock = header.deblock
        pd.beta_offset = segment.beta_offset
        pd.tc_offset = segment.tc_offset
        pd.lic_active = header.allow_lic
        pd.ref_pic_lists = ref_pic_list

    def decode(self, segment, prev_segment, bit_reader, post_process=True):
        """Decode one picture.  With a mesh installed (engine.set_mesh)
        and no pin yet, this is the GOP-across-devices decode pipeline
        (the mesh analog of the reference's picture-level thread pool,
        ref: src/xvc_dec_lib/thread_decoder.cc:109-176): the picture's
        batched device stages run pinned to one mesh device (round-robin
        over DOC) while its reference planes move device-to-device once
        via the frame store (tpu/flat_recon.py ensure_slot).  Placement
        cannot change any integer result, so mesh-pinned == unsharded,
        byte for byte (tests/test_sharding.py)."""
        from ..engine import (use_jax_dsp, get_mesh, get_pin_device,
                              set_pin_device)
        if not (use_jax_dsp() and get_mesh() is not None
                and get_pin_device() is None):
            return self._decode_impl(segment, prev_segment, bit_reader,
                                     post_process)
        import jax
        devs = list(get_mesh().devices.flat)
        # Placement follows the schedule: a sequential session decodes
        # one picture at a time with reference dependencies chaining
        # them, so spreading pictures over devices only adds d2d ref
        # moves and cross-device dispatch latency — everything stays on
        # one chip.  The threaded pipeline overlaps pictures, so there
        # DOC-pair rotation covers the mesh (pairs share a device:
        # temporally adjacent pictures usually reference each other,
        # halving the reference-plane traffic).
        if getattr(self, "_pipelined", False):
            pin = devs[(self.pic_data.doc // 2) % len(devs)]
        else:
            pin = devs[0]
        set_pin_device(pin)
        try:
            with jax.default_device(pin):
                self._prefetch_ref_slots()
                return self._decode_impl(segment, prev_segment,
                                         bit_reader, post_process)
        finally:
            set_pin_device(None)

    def _prefetch_ref_slots(self):
        """Start the device-to-device moves of reference planes decoded
        on OTHER mesh devices now, so the (async) copies overlap this
        picture's host CABAC parse instead of stalling the first MC
        dispatch (ensure_slot would otherwise issue them lazily
        mid-reconstruction)."""
        from ..tpu import flat_recon
        rpl = self.pic_data.ref_pic_lists
        for lst in range(2):
            for i in range(rpl.get_num_ref_pics(lst)):
                entry = rpl.entries[lst][i]
                rec = getattr(entry, "rec_pic", None)
                if rec is not None and getattr(rec, "_dev_slots", None):
                    flat_recon.ensure_slot(rec)

    def _decode_impl(self, segment, prev_segment, bit_reader,
                     post_process=True):
        pd = self.pic_data
        self.finish_post()  # join any stale async post before buffer reuse
        restr = segment.restrictions
        qp = Qp(self.pic_qp, pd.chroma_format, pd.bitdepth, 0.0,
                segment.chroma_qp_offset_table, segment.chroma_qp_offset_u,
                segment.chroma_qp_offset_v)
        from ..engine import use_jax_dsp, use_native_pic_decode
        from ..profiling import span
        jax_dsp = use_jax_dsp()
        if getattr(segment, "tile_rows", 1) >= 2:
            # CTU-tile-row extension: per-tile CABAC substreams with
            # prediction cut at tile tops; scalar Python twin path
            # (native/flat engines cover tile_rows==1 only).
            return self._decode_tiles(segment, prev_segment, bit_reader,
                                      qp, post_process)
        # int16 surfaces hold samples up to 14-bit (the encoder-side
        # maximum, ref: xvcenc.cc bitdepth args); streams whose header
        # claims 15/16-bit (unproducible, but the header field allows
        # them) take the Python int32 path
        native_pic_decode = not jax_dsp and use_native_pic_decode() and \
            pd.bitdepth <= 14
        # flat record-driven device path (tpu/flat_recon.py): needs the
        # native parse and the default toolset; no Python CU tree at all
        use_flat = False
        if jax_dsp and pd.bitdepth <= 14 and use_native_pic_decode():
            from ..native import pic as native_pic
            if native_pic.parse_available():
                from ..engine import get_mesh, get_pin_device
                from ..tpu import flat_recon
                # flat path runs unsharded-per-picture: eligible when no
                # mesh is set OR the picture is pinned to a mesh device
                # (decode() installs the pin whenever a mesh is active)
                use_flat = (get_mesh() is None or
                            get_pin_device() is not None) and \
                    flat_recon.eligible(pd, restr)
        pd.init(segment, qp, True,
                light=native_pic_decode or use_flat)
        pd.mv_resolved = False
        pd._parse_records = None
        success = True
        if native_pic_decode:
            # Single-call native decode: CABAC parse, MV derivation,
            # reconstruction and deblocking run in C++
            # (native/xvcn_pic.inc), the compiled-decoder performance
            # role of ref: src/xvc_dec_lib/cu_decoder.cc:47-138.
            from ..native import pic as native_pic
            with span("decode.native"):
                success = native_pic.decode_picture(self, segment,
                                                    bit_reader, qp)
        else:
            native_parse = False
            if jax_dsp and pd.bitdepth <= 14 and use_native_pic_decode():
                from ..native import pic as native_pic
                native_parse = native_pic.parse_available()
            cu_decoder = None
            if native_parse:
                # CABAC parse + MV derivation in C++; the flat path
                # consumes the record table directly, the replay path
                # rebuilds the Python CU tree for tpu/recon.py.
                from ..native import pic as native_pic
                with span("decode.parse"):
                    success = native_pic.parse_picture(
                        self, segment, bit_reader, qp,
                        replay=not use_flat)
            else:
                cu_decoder = CuDecoder(self.rec_pic, pd, restr)
                reader = SyntaxReader(qp, pd.get_prediction_type(),
                                      bit_reader, restr)
                with span("decode.parse" if jax_dsp
                          else "decode.parse+recon"):
                    for rsaddr in range(pd.get_number_of_ctus()):
                        cu_decoder.decode_ctu(rsaddr, reader,
                                              reconstruct=not jax_dsp)
            if jax_dsp:
                if use_flat:
                    from ..tpu import flat_recon
                    with span("decode.flat"):
                        flat_recon.reconstruct(self, segment, qp)
                else:
                    if cu_decoder is None:
                        cu_decoder = CuDecoder(self.rec_pic, pd, restr)
                    from ..tpu.recon import JaxReconstructor
                    JaxReconstructor(cu_decoder).reconstruct_picture()
            if pd.deblock:
                with span("decode.deblock"):
                    deblocker = DeblockingFilter(pd, self.rec_pic,
                                                 pd.beta_offset,
                                                 pd.tc_offset, restr)
                    deblocker.deblock_picture()
            if not native_parse and not reader.finish():
                success = False
        pad_needed = pd.tid == 0 or not pd.highest_layer
        alt_needed = (pd.nal_type == k.NalUnitType.INTRA_ACCESS_PICTURE and
                      prev_segment.open_gop)
        native_post = native_pic_decode and post_process and not alt_needed
        if native_post:
            from ..native import pic as native_pic
            native_post = native_pic.post_available()
        if native_post:
            pd.ref_pic_lists.zero_out_references()
            with span("decode.native.post"):
                success = self._postprocess_native(
                    segment, bit_reader, pad_needed) and success
            return success
        if pad_needed:
            self.rec_pic.pad_border()
        if alt_needed:
            self._generate_alternative_rec_pic(segment, prev_segment)
        pd.ref_pic_lists.zero_out_references()
        if post_process:
            success = self.postprocess(segment, bit_reader) and success
        return success

    def _decode_tiles(self, segment, prev_segment, bit_reader, qp,
                      post_process):
        """Tile-extension picture decode: R CTU-row tiles, each parsed
        from its own size-prefixed CABAC substream with pd.tile_ctx_top_y
        masking neighbor/intra availability above the tile, then one
        whole-picture deblock pass across tile edges (the halo stage of
        the sharded mapping)."""
        from ..bitio import BitReader
        pd = self.pic_data
        self.finish_post()
        restr = segment.restrictions
        pd.init(segment, qp, True)
        pd.mv_resolved = False
        pd._parse_records = None
        tiles = pd.set_tiles(segment.tile_rows)
        sizes = [bit_reader.read_bits(32) for _ in tiles]
        success = True
        from ..engine import use_jax_dsp
        jax_dsp = use_jax_dsp()
        from ..profiling import span
        cu_decoder = CuDecoder(self.rec_pic, pd, restr)
        with span("decode.tiles"):
            for (row0, row1), size in zip(tiles, sizes):
                payload = bit_reader.read_bytes(size)
                reader = SyntaxReader(qp, pd.get_prediction_type(),
                                      BitReader(payload), restr)
                pd.tile_ctx_top_y = row0 * k.CTU_SIZE
                for row in range(row0, row1):
                    for cx in range(pd.ctu_num_x):
                        cu_decoder.decode_ctu(row * pd.ctu_num_x + cx,
                                              reader,
                                              reconstruct=not jax_dsp)
                if not reader.finish():
                    success = False
        pd.tile_ctx_top_y = 0
        if jax_dsp:
            # In-picture mesh scale-out (SURVEY §2.5 config-5 mapping):
            # one whole-picture batched reconstruction whose block batch
            # is sharded over the mesh; the leaf walk re-applies each
            # CTU's tile mask so the collected jobs reproduce the
            # per-tile prediction cut exactly (tpu/recon.py
            # _for_each_leaf).  Byte-identical to the scalar tile path
            # (tests/test_tiles.py).
            from ..tpu.recon import JaxReconstructor
            with span("decode.tiles.recon"):
                JaxReconstructor(cu_decoder).reconstruct_picture()
        if pd.deblock:
            with span("decode.deblock"):
                DeblockingFilter(pd, self.rec_pic, pd.beta_offset,
                                 pd.tc_offset, restr).deblock_picture()
        pad_needed = pd.tid == 0 or not pd.highest_layer
        alt_needed = (pd.nal_type == k.NalUnitType.INTRA_ACCESS_PICTURE
                      and prev_segment.open_gop)
        if pad_needed:
            self.rec_pic.pad_border()
        if alt_needed:
            self._generate_alternative_rec_pic(segment, prev_segment)
        pd.ref_pic_lists.zero_out_references()
        if post_process:
            success = self.postprocess(segment, bit_reader) and success
        return success

    def _resolved_output_format(self):
        out_fmt = dict(self.output_format)
        if not out_fmt.get("width"):
            out_fmt["width"] = self.rec_pic.get_display_width(0)
        if not out_fmt.get("height"):
            out_fmt["height"] = self.rec_pic.get_display_height(0)
        if out_fmt.get("chroma_format",
                       k.ChromaFormat.UNDEFINED) == k.ChromaFormat.UNDEFINED:
            out_fmt["chroma_format"] = self.rec_pic.chroma_format
        if not out_fmt.get("bitdepth"):
            out_fmt["bitdepth"] = self.rec_pic.bitdepth
        return out_fmt

    def _postprocess_native(self, segment, bit_reader, pad_needed):
        """Single native call for border pad, int16 MC-shadow refresh,
        checksum and output serialization (native/xvcn_pic.inc
        xvcn_postprocess); falls back to convert_to for resize / ARGB /
        dither outputs.

        The read-only stages (checksum + output serialization) run on a
        worker thread overlapped with subsequent picture decodes; the
        expected in-bitstream hash is read synchronously here (bitstream
        position is serial state) and the comparison is deferred to
        finish_post(), joined by the session before the picture is
        output (codec/decoder.py _wait_for_picture)."""
        from ..native import pic as native_pic
        pd = self.pic_data
        restr = segment.restrictions
        want_hash = (pd.tid == 0 or
                     segment.checksum_mode == k.ChecksumMode.MAX_ROBUST)
        method = None
        if want_hash:
            method = k.ChecksumMethod.CRC if \
                restr.disable_high_level_default_checksum_method else \
                k.ChecksumMethod.MD5
        out_fmt = self._resolved_output_format()
        rec = self.rec_pic
        simple_out = (
            rec.width[0] > 0 and rec.height[0] > 0 and
            out_fmt["chroma_format"] == rec.chroma_format and
            out_fmt["width"] == rec.get_display_width(0) and
            out_fmt["height"] == rec.get_display_height(0) and
            not (out_fmt["bitdepth"] < rec.bitdepth and
                 out_fmt.get("dither", False)))
        if not native_pic.async_post_enabled():
            # Single-core host: run everything inline (same code path,
            # no worker thread) and compare the checksum immediately.
            pic_hash, out_bytes = native_pic.postprocess(
                rec, pad_needed, pad_needed, method, segment.checksum_mode,
                out_fmt if simple_out else None)
            if want_hash:
                self.pic_hash = pic_hash
                if segment.major_version <= 1:
                    bit_reader.read_byte()
                expected = bit_reader.read_bytes(len(self.pic_hash))
                ok = expected == self.pic_hash
            else:
                self.pic_hash = b""
                ok = True
            if out_bytes is not None:
                self.output_pic_bytes = out_bytes
            elif rec.width[0] == 0 or rec.height[0] == 0:
                self.output_pic_bytes = b""
            else:
                self.output_pic_bytes = output.convert_to(rec, out_fmt)
            return ok
        join = native_pic.postprocess(
            rec, pad_needed, pad_needed, method, segment.checksum_mode,
            out_fmt if simple_out else None, split_async=True)
        expected = b""
        if want_hash:
            if segment.major_version <= 1:
                bit_reader.read_byte()
            # digest length is deterministic (native checksum stage
            # writes 16/2 bytes per MD5/CRC digest, one digest per
            # plane in max-robust mode; xvcn_pic.inc checksum stage)
            num_comps = 3 if rec.chroma_format != k.ChromaFormat.MONOCHROME \
                else 1
            per = 16 if method == k.ChecksumMethod.MD5 else 2
            ndig = num_comps if \
                segment.checksum_mode == k.ChecksumMode.MAX_ROBUST else 1
            expected = bit_reader.read_bytes(per * ndig)

        def finish():
            pic_hash, out_bytes = join()
            if want_hash:
                self.pic_hash = pic_hash
                ok = expected == self.pic_hash
            else:
                self.pic_hash = b""
                ok = True
            if out_bytes is not None:
                self.output_pic_bytes = out_bytes
            elif rec.width[0] == 0 or rec.height[0] == 0:
                self.output_pic_bytes = b""
            else:
                self.output_pic_bytes = output.convert_to(rec, out_fmt)
            return ok

        self._post_finish = finish
        self._post_ready = getattr(join, "done", None)
        return True

    def post_ready(self):
        """True when no async post is pending or it has completed (a
        non-blocking probe used by lazy output pulls)."""
        if self._post_finish is None:
            return True
        ready = getattr(self, "_post_ready", None)
        return ready() if ready is not None else True

    def finish_post(self):
        """Join the deferred checksum/output stage; True if the picture
        conforms (or nothing was pending).  Idempotent."""
        finish = self._post_finish
        if finish is None:
            return True
        self._post_finish = None
        self._post_ready = None
        return finish()

    def _generate_alternative_rec_pic(self, segment, prev_segment):
        ps = prev_segment
        if (ps.chroma_format == k.ChromaFormat.UNDEFINED or
                ps.internal_width <= 0 or ps.internal_height <= 0 or
                (ps.chroma_format == segment.chroma_format and
                 ps.internal_width == segment.internal_width and
                 ps.internal_height == segment.internal_height and
                 ps.internal_bitdepth == segment.internal_bitdepth)):
            return
        self.generate_alternative_rec_pic(prev_segment)

    def postprocess(self, segment, bit_reader):
        success = True
        if self.pic_data.tid == 0 or \
                segment.checksum_mode == k.ChecksumMode.MAX_ROBUST:
            success = self._validate_checksum(segment, bit_reader)
        else:
            self.pic_hash = b""
        out_fmt = dict(self.output_format)
        if not out_fmt.get("width"):
            out_fmt["width"] = self.rec_pic.get_display_width(0)
        if not out_fmt.get("height"):
            out_fmt["height"] = self.rec_pic.get_display_height(0)
        if out_fmt.get("chroma_format",
                       k.ChromaFormat.UNDEFINED) == k.ChromaFormat.UNDEFINED:
            out_fmt["chroma_format"] = self.rec_pic.chroma_format
        if not out_fmt.get("bitdepth"):
            out_fmt["bitdepth"] = self.rec_pic.bitdepth
        self.output_pic_bytes = output.convert_to(self.rec_pic, out_fmt)
        return success

    def _validate_checksum(self, segment, bit_reader):
        restr = segment.restrictions
        method = k.ChecksumMethod.CRC if \
            restr.disable_high_level_default_checksum_method else \
            k.ChecksumMethod.MD5
        self.pic_hash = cksum.hash_picture(self.rec_pic, method,
                                           segment.checksum_mode)
        if segment.major_version <= 1:
            bit_reader.read_byte()
        expected = bit_reader.read_bytes(len(self.pic_hash))
        return expected == self.pic_hash
