"""TurboCodec: the whole closed-loop codec as ONE jitted wavefront scan.

v1 (engine/wavefront.py WavefrontCodec) keeps rANS on the host and pays
one host<->device round trip per wavefront step on decode — measured at
~25 ms/step through the TPU tunnel while the actual rANS work is ~0.5 ms.
TurboCodec removes every in-loop host interaction:

  * decode: the rans32 lane-interleaved streams (coding/rans32.py) are
    decoded ON DEVICE (engine/device_rans.py) inside the scan body, right
    between the entropy-parameter matmuls and the synthesis matmuls;
  * encode: the same scan computes symbols; one C++ call afterwards
    (coding/api.encode_interleaved) produces the bitstream.

Bit-exactness between encoder and decoder reconstructions — the codec's
correctness criterion (reference agents/blkbsdimgcomp_agent.py:600-602) —
is guaranteed BY CONSTRUCTION: encode and decode execute the *same
compiled program* (XLA executables are only bitwise-reproducible within
one program — measured: scan-embedded math differs bitwise from the same
math compiled standalone). The mode is a *traced* boolean `is_decode`:
  y_sym = where(is_decode, rans_decoded_symbols, round(y - mu))
so both modes share every float op that feeds the committed zhat.

The dummy-side inputs (x for decode, bitstream for encode) are zeros; the
inactive branch's work is wasted but small, and shapes stay identical."""

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lbic_tpu.coding import api as coding
from lbic_tpu.coding import rans32
from lbic_tpu.engine import device_rans
from lbic_tpu.engine import wavefront as wf
from lbic_tpu.models import lbic as M
from lbic_tpu.ops import entropy as ent


class TurboCodec:
    """Single-dispatch wavefront codec on rans32 streams.

    G: channel groups per wavefront lane (streams per image =
    Dmax * G); more streams = more VPU parallelism in the device rANS
    decoder, fewer = slightly better compression (shorter headers).
    hw_factor: bitstream capacity in halfwords per symbol (static shape
    for the unified program; encode validates the real stream fits)."""

    def __init__(self, md: M.ModelDef, params, G: int = 8,
                 hw_factor: int = 2, cdf_tables=None, mesh=None,
                 device_encode: bool = True, lane_slots: int = 1):
        """mesh: optional jax.sharding.Mesh with a "data" axis — images
        shard across it (embarrassingly parallel eval, the reference's
        per-image loop agents/blkbsdimgcomp_agent.py:578 spread over
        chips). Batch size must be divisible by the axis size.

        device_encode: run the rANS *encoder* on device too
        (engine/device_rans.encode_lanes) so compress only transfers the
        final ~KB bitstream instead of the full (symbols, indexes)
        arrays — the measured bottleneck through the host link is the
        device->host transfer, not compute. False falls back to the
        host C++/numpy encoder (bit-identical streams either way)."""
        assert md.M % G == 0, (md.M, G)
        self.md = md
        self.params = params
        self.mesh = mesh
        self.G = G
        # lane_slots (KS): schedule slots per stream. Streams per image =
        # ceil(Dmax/KS) * G, so KS divides the ~6 B/stream header+state
        # overhead by KS; decode runs KS x more sequential iterations per
        # wavefront step (measured on v5e the decoder is
        # touch-throughput-bound, so moderate KS is nearly free —
        # results/PERF_LOG.md)
        self.KS = lane_slots
        self.hw_factor = hw_factor
        self.device_encode = device_encode
        self.scale_table = ent.get_scale_table()
        self.tables = cdf_tables or ent.build_gaussian_cdfs(
            np.asarray(self.scale_table))
        self._cdf = jnp.asarray(self.tables["cdf"])
        self._cdf_len = jnp.asarray(self.tables["cdf_lengths"])
        self._offsets = jnp.asarray(self.tables["offsets"])
        self._fused = jnp.asarray(device_rans.build_fused_luts(
            self.tables["cdf"], self.tables["cdf_lengths"],
            self.tables["offsets"]))
        sf_rows, mo2 = device_rans.build_encode_luts(
            self.tables["cdf"], self.tables["cdf_lengths"],
            self.tables["offsets"])
        self._enc_luts = (jnp.asarray(sf_rows), jnp.asarray(mo2))
        self._sched_cache = {}
        self._scan_cache = {}

    def schedule(self, Hb, Wb) -> wf.Schedule:
        key = (Hb, Wb)
        if key not in self._sched_cache:
            self._sched_cache[key] = wf.make_schedule(
                Hb, Wb, wf.min_slope(self.md))
        return self._sched_cache[key]

    def _lane_grid(self, sched):
        """(Dmax_p, LS): slot axis padded to a lane_slots multiple and
        the resulting lanes-per-group count."""
        Dmax_p = -(-sched.Dmax // self.KS) * self.KS
        return Dmax_p, Dmax_p // self.KS

    def _merge_valid(self, sched):
        """Schedule valid mask on the merged (steps*KS, LS) grid — the
        reshape under which rans32 v2 == the slot-merged v3 mapping."""
        Dmax_p, LS = self._lane_grid(sched)
        vpad = np.pad(sched.valid,
                      ((0, 0), (0, Dmax_p - sched.Dmax)))
        return vpad.reshape(-1, LS, self.KS).transpose(0, 2, 1).reshape(
            -1, LS)

    def _caps(self, n, Hb, Wb):
        n_sym = Hb * Wb * self.md.M
        _, LS = self._lane_grid(self.schedule(Hb, Wb))
        lanes_hw = LS * self.G * 2
        cap = n * (self.hw_factor * n_sym + lanes_hw)
        return cap + (cap & 1)  # even: the fused decoder word-packs it

    # ------------------------------ the scan ------------------------------

    def _scan_fn(self, n, Hb, Wb, compact=True):
        """compact=True: return (zhat, valid-compacted step-major symbols,
        int8 indexes) for the host encoder. compact=False: return the raw
        (steps, n, Dmax, M) int32 symbol/index stacks for the on-device
        encoder (no compaction gather; nothing leaves HBM)."""
        key = (n, Hb, Wb, compact)
        if key in self._scan_cache:
            return self._scan_cache[key]
        md, G, KS = self.md, self.G, self.KS
        sched = self.schedule(Hb, Wb)
        Dmax_p, _ = self._lane_grid(sched)
        slot_pad = Dmax_p - sched.Dmax
        P = md.ms_lru
        vs_t = jnp.asarray(sched.vs)
        hs_t = jnp.asarray(sched.hs)
        valid_t = jnp.asarray(sched.valid)
        cdf, cdf_len, offsets = self._cdf, self._cdf_len, self._offsets
        fused = self._fused
        scale_table = self.scale_table
        # step-major positions of valid blocks in the (steps*Dmax) grid:
        # compacting on device cuts the encoder's symbol transfer ~3x
        valid_pos = jnp.asarray(np.flatnonzero(sched.valid.ravel()))

        def scan(params, x, hw, lane_x0, lane_pos0, is_decode):
            zpad0 = jnp.zeros((n, Hb + 2 * P, Wb + 2 * P, md.cx),
                              jnp.float32)
            # word-packed stream for the fused decoder's slice refills —
            # ONCE per call, outside the scan body (capacity is even)
            hww = device_rans.pack_halfwords(hw)

            def body(carry, inp):
                zpad, lx, lp = carry
                vs, hs, valid = inp
                # entropy parameters for this step's blocks
                zwin = wf._gather_windows(zpad, vs, hs, P, md.ms_lru)
                scales, means = M.meanscale_window(
                    md, params, wf._flatten_nd(zwin))
                idx = ent.build_indexes(scales, scale_table)
                idx_b = wf._unflatten_nd(idx, n)          # (n, Dmax, M)
                means_b = wf._unflatten_nd(means, n)
                # encoder branch: analysis + quantize
                vi = jnp.clip(vs, 0, Hb - 1)
                hi = jnp.clip(hs, 0, Wb - 1)
                xblk = x[:, vi, hi, :]
                zwin_tr = wf._gather_windows(zpad, vs, hs, P, md.tr_lru)
                y = M.analysis_block(md, params, wf._flatten_nd(zwin_tr),
                                     wf._flatten_nd(xblk))
                y_sym_enc = jnp.round(y - means).astype(jnp.int32)
                y_sym_enc = wf._unflatten_nd(y_sym_enc, n)
                # decoder branch: on-device rANS
                if KS == 1:
                    sym_dec, lx, lp = device_rans.decode_block_channels(
                        hw, lx, lp, idx_b, valid & is_decode, G,
                        cdf, cdf_len, offsets, fused=fused,
                        cheap=jnp.logical_not(is_decode), hw_words=hww)
                else:
                    # pad only the entropy-decode inputs to the merged
                    # grid; the model math stays on the Dmax slots
                    idx_p = jnp.pad(idx_b,
                                    ((0, 0), (0, slot_pad), (0, 0)))
                    val_p = jnp.pad(valid & is_decode, (0, slot_pad))
                    sym_dec, lx, lp = \
                        device_rans.decode_block_channels_merged(
                            hw, lx, lp, idx_p, val_p, G, KS, fused,
                            cheap=jnp.logical_not(is_decode),
                            hw_words=hww)
                    sym_dec = sym_dec[:, :idx_b.shape[1]]
                y_sym = jnp.where(is_decode, sym_dec, y_sym_enc)
                # shared tail: dequantize + synthesis + commit
                y_qnt = wf._flatten_nd(y_sym).astype(jnp.float32) + means
                xhat = M.synthesis_block(
                    md, params, wf._flatten_nd(zwin_tr), y_qnt)
                zpad = wf._commit(md, zpad, xhat, vs, hs)
                return (zpad, lx, lp), (y_sym, idx_b)

            (zpad, _, _), (ys, idxs) = jax.lax.scan(
                body, (zpad0, lane_x0, lane_pos0), (vs_t, hs_t, valid_t))
            zhat = zpad[:, P:P + Hb, P:P + Wb, :]
            if not compact:
                return zhat, ys, idxs
            # compact to valid blocks only, step-major (transfer shrinks
            # from steps*Dmax to Hb*Wb rows; idx fits int8: < 64 scales)
            ys_c = jnp.moveaxis(ys, 1, 0).reshape(
                ys.shape[1], -1, ys.shape[-1])[:, valid_pos]
            idx_c = jnp.moveaxis(idxs, 1, 0).reshape(
                idxs.shape[1], -1, idxs.shape[-1])[:, valid_pos]
            return zhat, ys_c, idx_c.astype(jnp.int8)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as Sp

            def sh(*spec):
                return NamedSharding(self.mesh, Sp(*spec))

            rep = sh()
            batch = sh("data")
            batch1 = sh(None, "data")  # (steps, n, ...) raw stacks
            out_sh = ((batch, batch, batch) if compact
                      else (batch, batch1, batch1))
            fn = jax.jit(scan, in_shardings=(
                jax.tree.map(lambda _: rep, self.params),  # params
                batch,                                     # x
                rep,                                       # hw
                batch, batch,                              # lane x/pos
                rep,                                       # is_decode
            ), out_shardings=out_sh)
        else:
            fn = jax.jit(scan)
        self._scan_cache[key] = fn
        return fn

    # --------------------------- device encoder ---------------------------

    def _encode_fn(self, n, Hb, Wb):
        """Jitted two-phase on-device rANS encode (device_rans docstring):
        phase A runs the reverse-order automaton (scatter-free emission
        stacking + lane lengths); phase B gathers the contiguous payload
        into a host-chosen power-of-two halfword bucket."""
        key = ("enc", n, Hb, Wb)
        if key in self._scan_cache:
            return self._scan_cache[key]
        sched = self.schedule(Hb, Wb)
        G, KS = self.G, self.KS
        Dmax_p, LS = self._lane_grid(sched)
        slot_pad = Dmax_p - sched.Dmax
        valid_t = jnp.asarray(self._merge_valid(sched))
        cdf, cdf_len, offsets = self._cdf, self._cdf_len, self._offsets
        enc_luts = self._enc_luts

        def merge(a):
            """(steps, n, Dmax, M) -> (steps*KS, n, LS, M): the reshape
            under which the v2 encoder produces the slot-merged format."""
            a = jnp.pad(a, ((0, 0), (0, 0), (0, slot_pad), (0, 0)))
            steps, nn, _, Mch = a.shape
            a = a.reshape(steps, nn, LS, KS, Mch)
            return jnp.transpose(a, (0, 3, 1, 2, 4)).reshape(
                steps * KS, nn, LS, Mch)

        @jax.jit
        def phase_a(ys, idxs):
            vals, flags, x = device_rans.encode_emissions(
                merge(ys), merge(idxs), valid_t, G, cdf, cdf_len,
                offsets, enc_luts=enc_luts)
            lens, csum = device_rans.lane_lengths(flags, n)
            return vals, flags, csum, x, lens

        @functools.partial(jax.jit, static_argnums=4)
        def phase_b(vals, flags, csum, x, W_hw):
            return device_rans.gather_payload(vals, flags, csum, x, W_hw)

        self._scan_cache[key] = (phase_a, phase_b)
        return self._scan_cache[key]

    @functools.lru_cache(maxsize=64)
    def _expander(self, packed_len, cap):
        """Tiny jitted unpacker: ship the bitstream as packed uint32
        halfword-pairs (half the bytes over the host link) and expand to
        the scan's fixed-capacity halfword array on device."""

        def f(packed):
            lo = packed & jnp.uint32(0xFFFF)
            hi = packed >> 16
            hw = jnp.stack([lo, hi], axis=1).reshape(-1)
            return jnp.zeros((cap,), jnp.uint32).at[
                :2 * packed_len].set(hw)

        return jax.jit(f)

    # ------------------------------- encode -------------------------------

    def compress(self, x) -> Tuple[List[bytes], jax.Array]:
        """x: (N, Hb, Wb, cx) in [-0.5, 0.5] ->
        (rans32 streams per image, zhat).

        zhat is returned as a DEVICE array — callers that only need
        metrics/equality should compute them on device; np.asarray pulls
        it (19 MB/image batch through the host link)."""
        n, Hb, Wb, _ = x.shape
        sched = self.schedule(Hb, Wb)
        G = self.G
        _, LS = self._lane_grid(sched)
        cap = self._caps(n, Hb, Wb)
        fn = self._scan_fn(n, Hb, Wb, compact=not self.device_encode)
        hw = jnp.zeros((cap,), jnp.uint32)
        lx = jnp.zeros((n, LS, G), jnp.uint32)
        lp = jnp.zeros((n, LS, G), jnp.int32)
        zhat, ys_c, idx_c = fn(self.params, jnp.asarray(x), hw, lx, lp,
                               jnp.asarray(False))
        if self.device_encode:
            phase_a, phase_b = self._encode_fn(n, Hb, Wb)
            vals, flags, csum, xst, lens = phase_a(ys_c, idx_c)
            lens = np.asarray(lens)     # (n, LZ) — tiny, syncs phase A
            totals = lens.sum(1)
            # power-of-two halfword bucket bounds phase-B recompiles
            W_hw = max(256, 1 << int(np.ceil(np.log2(int(totals.max())))))
            _, packed = phase_b(vals, flags, csum, xst, W_hw)
            part = np.asarray(packed)   # W_hw/2 uint32 per image
            LZ = LS * G
            if lens.max() > 0xFFFF or LZ > 0xFFFF:
                raise ValueError(
                    f"lane stream {int(lens.max())} halfwords exceeds the "
                    f"uint16 header limit — raise G (now {G})")
            head0 = np.empty(1 + LZ, np.uint16)
            head0[0] = LZ
            streams = []
            hw16 = np.zeros(2 * part.shape[1], np.uint16)
            for i in range(n):
                hw16[0::2] = part[i] & 0xFFFF
                hw16[1::2] = part[i] >> 16
                head0[1:] = lens[i]
                streams.append(head0.tobytes()
                               + hw16[:int(totals[i])].tobytes())
            return streams, zhat
        ys_c = np.asarray(ys_c)        # (N, nblocks, M) step-major
        idx_c = np.asarray(idx_c).astype(np.int32)
        Mch = self.md.M
        vmask = sched.valid
        vmerged = self._merge_valid(sched)
        Dmax_p, _ = self._lane_grid(sched)
        t = self.tables

        def merge(a):
            a = np.pad(a, ((0, 0), (0, Dmax_p - sched.Dmax), (0, 0)))
            a = a.reshape(sched.steps, LS, self.KS, Mch)
            return a.transpose(0, 2, 1, 3).reshape(-1, LS, Mch)

        streams = []
        ys_pad = np.zeros((sched.steps, sched.Dmax, Mch), np.int32)
        idx_pad = np.zeros_like(ys_pad)
        for i in range(n):
            ys_pad[vmask] = ys_c[i]
            idx_pad[vmask] = idx_c[i]
            s = coding.encode_interleaved(
                merge(ys_pad), merge(idx_pad), vmerged, Mch, G,
                t["cdf"], t["cdf_lengths"], t["offsets"])
            if (len(s) + 1) // 2 > cap // n:
                raise ValueError(
                    f"stream larger than hw capacity ({len(s)}B); raise "
                    f"hw_factor (now {self.hw_factor})")
            streams.append(s)
        return streams, zhat

    # ------------------------------- decode -------------------------------

    def decompress(self, streams: List[bytes], Hb: int, Wb: int):
        n = len(streams)
        sched = self.schedule(Hb, Wb)
        G = self.G
        _, LS = self._lane_grid(sched)
        cap = self._caps(n, Hb, Wb)
        hws, starts = [], []
        off = 0
        for s in streams:
            h, st = rans32.parse_header(s)
            assert len(st) == LS * G, (len(st), LS, G)
            hws.append(h)
            starts.append(st + off)
            off += len(h)
        cat = np.concatenate(hws) if hws else np.zeros(0, np.int32)
        assert cat.size <= cap, (cat.size, cap)
        if cat.size % 2:
            cat = np.append(cat, 0)
        packed = (cat[0::2].astype(np.uint32)
                  | (cat[1::2].astype(np.uint32) << 16))
        # bucket to limit expander recompiles
        bucket = max(256, 1 << int(np.ceil(np.log2(max(packed.size, 1)))))
        bucket = min(bucket, (cap + 1) // 2)
        padded = np.zeros(bucket, np.uint32)
        padded[:packed.size] = packed
        starts = np.stack(starts).reshape(n, LS, G)
        fn = self._scan_fn(n, Hb, Wb, compact=not self.device_encode)
        hw = self._expander(bucket, cap)(jnp.asarray(padded))
        lx, lp = device_rans.init_lane_state(hw, jnp.asarray(starts))
        x0 = jnp.zeros((n, Hb, Wb, self.md.cx), jnp.float32)
        zhat, _, _ = fn(self.params, x0, hw, lx, lp, jnp.asarray(True))
        return zhat
