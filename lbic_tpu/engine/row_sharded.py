"""Row-sharded wavefront: one image's closed loop across devices.

The sequence-parallel analog promised by the design (SURVEY.md §2.15):
the block-row axis of ONE image is sharded over the mesh's "row" axis;
each device runs the wavefront schedule over its own rows, and after
every step the freshly committed bottom rows ride the ICI to the next
device via `lax.ppermute` — the "halo exchange" of reconstructed
neighbor context. This parallelizes the reference's strictly sequential
closed loop (agents/blkbsdimgcomp_agent.py:491-549 validate_recu_reco_fast)
across chips in the *latency* direction (a single image decodes faster),
complementing TurboCodec's batch/image sharding (throughput direction).

Correctness of the halo timing: the composite dependency footprint of a
block (wavefront.composite_offsets) reaches row v-j only at columns
h' <= h + j*slope - 1, and block (v-j, h') commits at step
slope*(v-j) + h' < slope*v + h. So a halo carrying commits through step
t-1 is sufficient for step t, and a ppermute after every step provides
exactly that. Rows *below* a block inside its gather window are read but
numerically irrelevant: every tap that touches them is zero in the
composite layer masks.

Entropy coding is intentionally out of scope here: rans32 lane states
would have to migrate across devices as diagonals cross shard
boundaries; image-sharded TurboCodec already scales the entropy-coded
path. This engine is the closed-loop reconstruction / symbol-generation
core (exactly what validate_recu_reco measures).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lbic_tpu.engine import wavefront as wf
from lbic_tpu.models import lbic as M
from lbic_tpu.ops import entropy as ent


def make_local_schedules(Hb, Wb, slope, R):
    """Per-device slices of the global wavefront schedule.

    Returns (vs, hs, valid): (R, steps, Dloc) with vs LOCAL to the shard
    (v_loc = v - r*Hs); invalid lanes hold OOB sentinels."""
    assert Hb % R == 0, (Hb, R)
    Hs = Hb // R
    sched = wf.make_schedule(Hb, Wb, slope)
    steps = sched.steps
    rows = [[[] for _ in range(steps)] for _ in range(R)]
    for d in range(steps):
        for i in range(sched.Dmax):
            if sched.valid[d, i]:
                v, h = int(sched.vs[d, i]), int(sched.hs[d, i])
                rows[v // Hs][d].append((v - (v // Hs) * Hs, h))
    Dloc = max(len(b) for dev in rows for b in dev)
    vs = np.full((R, steps, Dloc), Hs + 10, np.int32)
    hs = np.full((R, steps, Dloc), Wb + 10, np.int32)
    valid = np.zeros((R, steps, Dloc), bool)
    for r in range(R):
        for d in range(steps):
            for i, (vl, h) in enumerate(rows[r][d]):
                vs[r, d, i], hs[r, d, i], valid[r, d, i] = vl, h, True
    return vs, hs, valid, steps, Dloc


@functools.partial(jax.jit, static_argnames=("md", "mesh", "quant8"))
def _run(md: M.ModelDef, mesh: Mesh, params, x, vs, hs, valid,
         quant8=False):
    n, Hb, Wb, _ = x.shape
    R = mesh.shape["row"]
    Hs = Hb // R
    Pd = md.ms_lru
    scale_table = ent.get_scale_table()

    def device_fn(params, xloc, vs_all, hs_all, valid_all):
        # xloc: (n, Hs, Wb, cx) — this device's rows
        r = jax.lax.axis_index("row")
        vs_t = vs_all[0]       # (steps, Dloc), already this device's slice
        hs_t = hs_all[0]
        valid_t = valid_all[0]
        # local padded state: P halo rows on top (filled by ppermute from
        # device r-1), P zero rows at the bottom (only masked taps read
        # them), P zero cols left/right
        zloc0 = jnp.zeros((n, Hs + 2 * Pd, Wb + 2 * Pd, md.cx), x.dtype)

        def body(zloc, inp):
            vs, hs, valid = inp
            vi = jnp.clip(vs, 0, Hs - 1)
            hi = jnp.clip(hs, 0, Wb - 1)
            xblk = xloc[:, vi, hi, :]
            zwin = wf._gather_windows(zloc, vs, hs, Pd, md.ms_lru)
            scales, means = M.meanscale_window(md, params,
                                               wf._flatten_nd(zwin))
            zwin_tr = wf._gather_windows(zloc, vs, hs, Pd, md.tr_lru)
            y = M.analysis_block(md, params, wf._flatten_nd(zwin_tr),
                                 wf._flatten_nd(xblk))
            y_sym = jnp.round(y - means)
            y_qnt = y_sym + means
            lik = ent.gaussian_likelihood(y_qnt, scales, means)
            bits = jnp.sum(jnp.where(valid[None, :, None],
                                     -jnp.log2(wf._unflatten_nd(lik, n)),
                                     0.0))
            xhat = M.synthesis_block(md, params, wf._flatten_nd(zwin_tr),
                                     y_qnt)
            xhat = jnp.clip(xhat, -0.5, 0.5)
            if quant8:
                xhat = jnp.round((xhat + 0.5) * 255.0) / 255.0 - 0.5
            zloc = zloc.at[:, vs + Pd, hs + Pd, :].set(
                wf._unflatten_nd(xhat, n).astype(zloc.dtype), mode="drop")
            # halo exchange: my last P owned rows -> next device's top
            # halo rows, over the ICI ring. The last device's send wraps
            # to device 0, which overwrites it with zeros (top border of
            # the image is zero padding, matching the reference's F.pad).
            strip = zloc[:, Hs:Hs + Pd, :, :]  # owned rows Hs-P..Hs-1
            recv = jax.lax.ppermute(
                strip, "row", [(i, (i + 1) % R) for i in range(R)])
            recv = jnp.where(r == 0, jnp.zeros_like(recv), recv)
            zloc = zloc.at[:, 0:Pd, :, :].set(recv)
            return zloc, bits

        zloc, bits = jax.lax.scan(body, zloc0, (vs_t, hs_t, valid_t))
        zhat_loc = zloc[:, Pd:Pd + Hs, Pd:Pd + Wb, :]
        total_bits = jax.lax.psum(jnp.sum(bits), "row")
        return zhat_loc, total_bits

    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(None, "row"), P("row"), P("row"), P("row")),
        out_specs=(P(None, "row"), P()),
        check_vma=False,
    )
    return fn(params, x, vs, hs, valid)


class RowShardedWavefront:
    """Closed-loop reconstruction of one (batch of) image(s) with the
    block-row axis sharded over `mesh`'s "row" axis.

    API mirrors wavefront.closed_loop_scan: __call__(x) ->
    (zhat, total_bits)."""

    def __init__(self, md: M.ModelDef, params, mesh: Mesh):
        assert "row" in mesh.shape, mesh
        self.md = md
        self.params = params
        self.mesh = mesh
        self._sched_cache = {}

    def _schedules(self, Hb, Wb):
        key = (Hb, Wb)
        if key not in self._sched_cache:
            R = self.mesh.shape["row"]
            vs, hs, valid, steps, Dloc = make_local_schedules(
                Hb, Wb, wf.min_slope(self.md), R)
            self._sched_cache[key] = (jnp.asarray(vs), jnp.asarray(hs),
                                      jnp.asarray(valid))
        return self._sched_cache[key]

    def __call__(self, x, quant8=False):
        x = jnp.asarray(x)
        n, Hb, Wb, _ = x.shape
        R = self.mesh.shape["row"]
        assert Hb % R == 0, f"Hb={Hb} not divisible by row axis {R}"
        vs, hs, valid = self._schedules(Hb, Wb)
        x = jax.device_put(x, NamedSharding(self.mesh,
                                            P(None, "row", None, None)))
        return _run(self.md, self.mesh, self.params, x, vs, hs, valid,
                    quant8=quant8)
