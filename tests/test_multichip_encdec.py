"""Multi-chip sharding of the real device P-frame step (CPU mesh).

The tile-column-sharded step (pipeline/tpu_shard.py) must produce
levels/MVs/eobs and loop-filtered reconstructions BIT-IDENTICAL to the
single-chip pframe_step for any shard count: positions and UMV clamps
stay global, halos carry exactly the reachable pixel set, and RC stats
psum to the same totals."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _mesh(n_frame, n_tile):
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[: n_frame * n_tile])
    if devs.size < n_frame * n_tile:
        pytest.skip("not enough virtual devices")
    return Mesh(devs.reshape(n_frame, n_tile), ("frame", "tile"))


def _single_chip_reference(g, src, ref, qidx):
    import jax.numpy as jnp

    from tpu_vp9.bitstream import tables as T
    from tpu_vp9.ops.loopfilter import pick_filter_level, sharpness_limits
    from tpu_vp9.pipeline.tpu_encdec import (
        extend_borders_device, make_pframe_step,
    )

    step = make_pframe_step(g)
    refs = (extend_borders_device(jnp.asarray(ref[0]), g.width, g.height),
            extend_borders_device(jnp.asarray(ref[1]), g.width // 2,
                                  g.height // 2),
            extend_borders_device(jnp.asarray(ref[2]), g.width // 2,
                                  g.height // 2))
    pm32 = jnp.zeros((g.n_blocks32, 2), jnp.int32)
    pm16 = jnp.zeros((1, 2), jnp.int32)
    lf = pick_filter_level(qidx, False)
    lim_t, mblim_t = sharpness_limits(0)
    outs, _ = step(jnp.asarray(src[0]), jnp.asarray(src[1]),
                   jnp.asarray(src[2]), *refs, pm32, pm16,
                   jnp.asarray(T.dc_quant(qidx), jnp.int32),
                   jnp.asarray(T.ac_quant(qidx), jnp.int32),
                   jnp.asarray(100, jnp.int32), jnp.asarray(lf, jnp.int32),
                   jnp.asarray(int(lim_t[lf]), jnp.int32),
                   jnp.asarray(int(mblim_t[lf]), jnp.int32))
    return outs


def _to_shard_layout(arr, g, n_tiles):
    """Global raster block order -> concat of per-shard raster orders."""
    rows, cols = g.rows32, g.cols32
    cl = cols // n_tiles
    a = arr.reshape(rows, cols, *arr.shape[1:])
    return np.concatenate([a[:, t * cl:(t + 1) * cl].reshape(
        rows * cl, *arr.shape[1:]) for t in range(n_tiles)], axis=0)


@pytest.mark.parametrize("n_frame,n_tile", [(1, 4), (2, 2), (1, 1)])
def test_sharded_step_matches_single_chip(n_frame, n_tile):
    import jax.numpy as jnp

    from tpu_vp9.bitstream import tables as T
    from tpu_vp9.ops.loopfilter import pick_filter_level, sharpness_limits
    from tpu_vp9.pipeline.tpu_encdec import make_geom, pad_plane
    from tpu_vp9.pipeline.tpu_shard import make_pframe_step_sharded

    w, h = 256, 128  # cols32 = 8, divisible by 4; mi_rows 16 (% 4 == 0)
    g = make_geom(w, h)
    rng = np.random.default_rng(7)

    def smooth(hh, ww, seed):
        r = np.random.default_rng(seed)
        base = r.integers(40, 200, (hh // 8, ww // 8)).astype(np.float32)
        up = np.kron(base, np.ones((8, 8), np.float32))
        return np.clip(up + r.normal(0, 2, (hh, ww)), 0, 255).astype(
            np.uint8)

    src = (pad_plane(smooth(h, w, 1), g.pad_h, g.pad_w),
           pad_plane(smooth(h // 2, w // 2, 2), g.pad_h // 2, g.pad_w // 2),
           pad_plane(smooth(h // 2, w // 2, 3), g.pad_h // 2, g.pad_w // 2))
    # reference = shifted source (motion to find)
    ref = (np.roll(src[0], 5, axis=1), np.roll(src[1], 2, axis=1),
           np.roll(src[2], 2, axis=1))
    qidx = 120
    want = _single_chip_reference(g, src, ref, qidx)

    mesh = _mesh(n_frame, n_tile)
    from jax.sharding import NamedSharding, PartitionSpec as P

    step = make_pframe_step_sharded(g, mesh, n_tile)
    f = n_frame  # one frame per frame-shard
    shp = NamedSharding(mesh, P("frame", None, "tile"))
    shb = NamedSharding(mesh, P("frame", "tile"))
    rep = NamedSharding(mesh, P())

    def bcast(x):
        return np.broadcast_to(x, (f, *x.shape)).copy()

    src_y = jax.device_put(bcast(src[0]), shp)
    src_u = jax.device_put(bcast(src[1]), shp)
    src_v = jax.device_put(bcast(src[2]), shp)
    ref_y = jax.device_put(bcast(ref[0]), shp)
    ref_u = jax.device_put(bcast(ref[1]), shp)
    ref_v = jax.device_put(bcast(ref[2]), shp)
    pm = jax.device_put(np.zeros((f, g.n_blocks32, 2), np.int32), shb)
    lf = pick_filter_level(qidx, False)
    lim_t, mblim_t = sharpness_limits(0)
    pm16 = jax.device_put(np.zeros((f, n_tile, 2), np.int32), shb)
    outs, new_refs = step(
        src_y, src_u, src_v, ref_y, ref_u, ref_v, pm, pm16,
        jnp.asarray(T.dc_quant(qidx), jnp.int32),
        jnp.asarray(T.ac_quant(qidx), jnp.int32),
        jnp.asarray(100, jnp.int32), jnp.asarray(lf, jnp.int32),
        jnp.asarray(int(lim_t[lf]), jnp.int32),
        jnp.asarray(int(mblim_t[lf]), jnp.int32))

    for fi in range(f):
        for k in ("mv", "skip", "eob_y", "eob_u", "eob_v",
                  "lv_y", "lv_u", "lv_v"):
            got = np.asarray(outs[k][fi])
            ref_k = _to_shard_layout(np.asarray(want["m32"][k]), g, n_tile)
            np.testing.assert_array_equal(got, ref_k, err_msg=k)
        np.testing.assert_array_equal(np.asarray(new_refs[0][fi]),
                                      np.asarray(want["rec_y"]))
        np.testing.assert_array_equal(np.asarray(new_refs[1][fi]),
                                      np.asarray(want["rec_u"]))
        # psum'd RC stats equal the single-chip totals
        assert int(outs["rate"][fi]) == int(want["m32"]["rate"])
        assert int(outs["dist"][fi]) == int(want["m32"]["dist"])


def test_rt_session_mesh_bitstream_identical():
    """VERDICT r3 #5: multi-chip must be reachable from the product —
    an RtSession over a (1, 2) tile mesh (128px shards: wide enough for
    the ppermute halo path) must produce byte-identical payloads to the
    single-chip session."""
    from tpu_vp9.pipeline.realtime import RtSession
    from tpu_vp9.utils.yuv import synthetic_frames

    w, h = 256, 128
    frames = list(synthetic_frames(w, h, 5, seed=9, motion=True))

    def run(mesh):
        sess = RtSession(w, h, want_recon=False, mesh_shape=mesh)
        out = []
        for fr in frames:
            out.extend(sess.send(fr, qindex=120))
        out.extend(sess.flush())
        return [ef.payload for ef in out]

    single = run(None)
    sharded = run((1, 2))
    assert len(single) == len(sharded) == 5
    for i, (a, b) in enumerate(zip(single, sharded)):
        assert a == b, f"frame {i} differs between 1-chip and 2-chip"


def test_rt_session_mesh_4way():
    from tpu_vp9.pipeline.realtime import RtSession
    from tpu_vp9.utils.yuv import synthetic_frames

    w, h = 512, 64
    frames = list(synthetic_frames(w, h, 3, seed=4, motion=True))
    sess = RtSession(w, h, want_recon=False, mesh_shape=(1, 4))
    ref = RtSession(w, h, want_recon=False)
    outs, outr = [], []
    for fr in frames:
        outs.extend(sess.send(fr, qindex=100))
        outr.extend(ref.send(fr, qindex=100))
    outs.extend(sess.flush())
    outr.extend(ref.flush())
    assert [e.payload for e in outs] == [e.payload for e in outr]


def test_rt_session_mesh_strip_geometry():
    """Strip geometries (720p/4K shapes: mi_rows % 4 == 2) shard too:
    the bottom 16-strip rides the same tile axis."""
    from tpu_vp9.pipeline.realtime import RtSession
    from tpu_vp9.utils.yuv import synthetic_frames

    w, h = 256, 80  # mi_rows = 10 -> rows32 = 2 + strip
    frames = list(synthetic_frames(w, h, 4, seed=6, motion=True))

    def run(mesh):
        sess = RtSession(w, h, want_recon=False, mesh_shape=mesh)
        out = []
        for fr in frames:
            out.extend(sess.send(fr, qindex=110))
        out.extend(sess.flush())
        return [ef.payload for ef in out]

    single = run(None)
    sharded = run((1, 2))
    assert [len(p) for p in single] == [len(p) for p in sharded]
    for i, (a, b) in enumerate(zip(single, sharded)):
        assert a == b, f"frame {i} differs between 1-chip and 2-chip"


def test_rt_session_mesh_golden_bitstream_identical():
    """VERDICT r4 #6: the mesh must carry the FULL M8 reference toolset
    — a GOLDEN-anchored session over a (1, 2) tile mesh must be
    byte-identical to the single-chip GOLDEN session (anchor halo-
    exchanged like LAST; per-block ref selection + entropy rate tables
    shard-invariant)."""
    from tpu_vp9.pipeline.realtime import RtSession
    from tpu_vp9.utils.yuv import synthetic_frames

    w, h = 256, 128
    frames = list(synthetic_frames(w, h, 6, seed=9, motion=True))

    def run(mesh):
        sess = RtSession(w, h, want_recon=False, mesh_shape=mesh,
                         golden=True, golden_interval=3)
        out = []
        for fr in frames:
            out.extend(sess.send(fr, qindex=120))
        out.extend(sess.flush())
        return [ef.payload for ef in out]

    single = run(None)
    sharded = run((1, 2))
    assert len(single) == len(sharded) == 6
    golden_used = False
    for i, (a, b) in enumerate(zip(single, sharded)):
        assert a == b, f"frame {i} differs between 1-chip and 2-chip"
    # the anchor must actually win somewhere for this test to bite
    sess = RtSession(w, h, want_recon=False, golden=True,
                     golden_interval=3)
    import numpy as np

    for fr in frames:
        sess.send(fr, qindex=120)
        if sess._pending is not None:
            z = sess._pending[3]["m32"]
            if "ref" in z and int(np.asarray(z["ref"]).sum()) > 0:
                golden_used = True
    sess.flush()
    assert golden_used
