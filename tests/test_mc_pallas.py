"""Pallas MC kernel vs gather-path equivalence (the gather path is itself
bit-exact vs oracle.inter / libavcodec in the conformance suite)."""

import numpy as np
import jax.numpy as jnp
import pytest

from arrow_h264_tpu.ops.inter import PAD, halfpel_planes, inter_predict, pad_chroma
from arrow_h264_tpu.ops.pallas.mc_kernel import (
    DX_MAX, DX_MIN, DY_MAX, DY_MIN, PADC, chroma_lanes, inter_predict_pallas,
    luma_lanes, pack_u8_plane,
)

MB_W, MB_H = 6, 4
H, W = MB_H * 16, MB_W * 16
S = 3


def make_dpb(rng):
    """Random reference frames -> (gather dpb, packed dpb)."""
    y4, cbs, crs = [], [], []
    y4p, cps = [], []
    WL, WLc = luma_lanes(W), chroma_lanes(W)
    for s in range(S):
        y = rng.integers(0, 256, (H, W), np.uint8)
        cb = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
        cr = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
        g, b, h, j = (np.asarray(p) for p in halfpel_planes(jnp.asarray(y)))
        planes = np.stack([g, b, h, j])
        y4.append(planes)
        cbp = np.asarray(pad_chroma(jnp.asarray(cb)))
        crp = np.asarray(pad_chroma(jnp.asarray(cr)))
        cbs.append(cbp)
        crs.append(crp)
        y4p.append(np.stack([np.asarray(pack_u8_plane(jnp.asarray(p), WL))
                             for p in planes]))
        cps.append(np.stack([np.asarray(pack_u8_plane(jnp.asarray(p), WLc))
                             for p in (cbp, crp)]))
    return (np.stack(y4), np.stack(cbs), np.stack(crs),
            jnp.asarray(np.stack(y4p)), jnp.asarray(np.stack(cps)))


def make_abi(rng, *, lists, weighted=False, mv_lo=-40, mv_hi=40):
    n = MB_W * MB_H
    # draw from a bounded MV palette (the pallas path's per-band candidate
    # cap is a host-checked contract; exceeding it falls back to gather)
    palette = rng.integers(mv_lo, mv_hi, (12, 2)).astype(np.int32)
    palette[:, 0] = np.clip(palette[:, 0], DX_MIN * 4, DX_MAX * 4)
    palette[:, 1] = np.clip(palette[:, 1], DY_MIN * 4, DY_MAX * 4)
    mv = palette[rng.integers(0, len(palette), (n, 4, 4, 2))]
    refslot = np.full((n, 4, 4, 2), -1, np.int32)
    for l in lists:
        refslot[..., l] = rng.integers(0, S, (n, 4, 4))
    if len(lists) == 2:
        # some blocks single-list
        drop = rng.random((n, 4, 4)) < 0.3
        which = rng.integers(0, 2, (n, 4, 4))
        for l in (0, 1):
            refslot[..., l][drop & (which == l)] = -1
    wp = np.zeros((n, 4, 4, 2, 3, 2), np.int32)
    logwd = np.zeros((n, 2), np.int32)
    if weighted:
        logwd[:] = [5, 6]
        wp[..., 0] = rng.integers(20, 44, (n, 4, 4, 2, 3))
        wp[..., 1] = rng.integers(-20, 20, (n, 4, 4, 2, 3))
    else:
        wp[..., 0] = 1
    kind = np.full(n, 4, np.int32)
    return {"mv": mv, "refslot": refslot, "wp": wp, "logwd": logwd,
            "kind": kind}


@pytest.mark.parametrize("lists,weighted", [
    ((0,), False), ((0, 1), False), ((0, 1), True),
])
def test_mc_pallas_matches_gather(lists, weighted):
    rng = np.random.default_rng(42 + len(lists) + weighted)
    dpb_y4, dpb_cb, dpb_cr, y4p, cps = make_dpb(rng)
    abi_np = make_abi(rng, lists=lists, weighted=weighted)
    abi = {k: jnp.asarray(v) for k, v in abi_np.items()}
    ref_y, ref_cb, ref_cr = inter_predict(
        abi, jnp.asarray(dpb_y4), jnp.asarray(dpb_cb), jnp.asarray(dpb_cr),
        MB_W, MB_H)
    got_y, got_cb, got_cr = inter_predict_pallas(
        abi, y4p, cps, [0, 1, 2, -1], MB_W, MB_H, lists=lists)
    # compare only lanes with any list used
    used = (abi_np["refslot"] >= 0).any(-1)          # [n,4,4]
    m = used.reshape(MB_H, MB_W, 4, 4).transpose(0, 2, 1, 3) \
        .reshape(MB_H * 4, MB_W * 4)
    m_y = np.repeat(np.repeat(m, 4, 0), 4, 1)
    m_c = np.repeat(np.repeat(m, 2, 0), 2, 1)
    for got, ref, msk, name in ((got_y, ref_y, m_y, "y"),
                                (got_cb, ref_cb, m_c, "cb"),
                                (got_cr, ref_cr, m_c, "cr")):
        g = np.asarray(got)
        r = np.asarray(ref)
        bad = (g != r) & msk
        assert not bad.any(), (
            name, np.argwhere(bad)[:4],
            g[bad][:4], r[bad][:4])


def test_mc_chroma_uniform_mv_coordinate_plane():
    """Uniform MV over a coordinate-encoded plane: catches systematic
    row/col offsets (e.g. the 40-row-slab Mosaic roll bug) that random
    content can mask when neighboring pixels are similar."""
    from arrow_h264_tpu.ops.pallas.mc_kernel import (
        chroma_rows, mc_prepare_chroma, mc_chroma_pallas)
    WLc = chroma_lanes(W)
    Hcp = chroma_rows(H)
    W2 = W // 2
    r = np.arange(Hcp)[:, None]
    c = np.arange(W2 + 2 * PADC)[None, :]
    plane = ((r * 3 + c * 7) % 256).astype(np.uint8)
    cp = jnp.asarray(np.stack([np.stack(
        [np.asarray(pack_u8_plane(jnp.asarray(plane), WLc))] * 2)]))
    n = MB_W * MB_H
    abi = {"mv": np.zeros((n, 4, 4, 2, 2), np.int32),
           "refslot": np.full((n, 4, 4, 2), -1, np.int32)}
    abi["mv"][..., 0, :] = [12, 8]        # dxc=1 xf=4, dyc=1 yf=0
    abi["refslot"][..., 0] = 0
    abi = {k: jnp.asarray(v) for k, v in abi.items()}
    sl = np.array([0, -1, -1, -1], np.int32)
    ce, co, xfyf, binfo = mc_prepare_chroma(abi, MB_W, MB_H, sl, 0)
    pc = mc_chroma_pallas(cp, ce, co, xfyf, binfo, sl, MB_W, MB_H)
    from arrow_h264_tpu.ops.pallas.mc_kernel import unpack_u32_plane
    got = np.asarray(unpack_u32_plane(pc, W2).astype(jnp.int32))[0]

    def exp(y, x):
        A = int(plane[16 + y + 1, 16 + x + 1])
        B = int(plane[16 + y + 1, 16 + x + 2])
        return (32 * A + 32 * B + 32) >> 6

    want = np.array([[exp(y, x) for x in range(W2)] for y in range(MB_H * 8)])
    assert (got == want).all(), np.argwhere(got != want)[:4]


def test_mc_pallas_small_mvs_zero():
    """Zero MVs must reproduce the reference pixels exactly."""
    rng = np.random.default_rng(7)
    dpb_y4, dpb_cb, dpb_cr, y4p, cps = make_dpb(rng)
    abi_np = make_abi(rng, lists=(0,), mv_lo=0, mv_hi=1)
    abi_np["mv"][:] = 0
    abi_np["refslot"][..., 0] = 1
    abi = {k: jnp.asarray(v) for k, v in abi_np.items()}
    got_y, got_cb, got_cr = inter_predict_pallas(
        abi, y4p, cps, [0, 1, 2, -1], MB_W, MB_H, lists=(0,))
    ref_y = dpb_y4[1, 0, PAD:PAD + H, PAD:PAD + W]
    assert (np.asarray(got_y) == ref_y).all()


# ---------------------------------------------------------------------------
# hybrid patch path: out-of-envelope cells repaired by the gather pass
# ---------------------------------------------------------------------------

def _full_abi(abi_np):
    """Extend the bare MC test abi with the fields select_inter_mode and
    resolve_weights read (already-dense wp short-circuits resolve)."""
    from arrow_h264_tpu.ops.abi import patch_capacity
    abi = dict(abi_np)
    abi.setdefault("kind", np.full(MB_W * MB_H, 4, np.int32))
    return abi


def test_select_inter_mode_evicts_to_patch():
    from arrow_h264_tpu.models.pipeline import select_inter_mode
    from arrow_h264_tpu.ops.synthetic import synthetic_abi_p
    abi = synthetic_abi_p(MB_W, MB_H, seed=3, n_slots=2, n_mv=8)
    # in-envelope baseline
    m0, sl0, p0 = select_inter_mode(abi, MB_W, MB_H)
    assert m0 == "pl0" and (p0 == -1).all()
    # blow the envelope on three cells -> patched mode, not gather
    abi["mv"][1, 0, 0, 0] = [999, -999]
    abi["mv"][5, 2, 1, 0] = [-800, 0]
    abi["mv"][7, 3, 3, 0] = [0, 700]
    for mb in (1, 5, 7):
        abi["kind"][mb] = 4
        abi["refslot"][mb, ..., 0] = 0
    m, sl, patch = select_inter_mode(abi, MB_W, MB_H)
    assert m == "pl0p"
    got = set(patch[patch >= 0].tolist())
    assert got == {1 * 16 + 0 * 4 + 0, 5 * 16 + 2 * 4 + 1, 7 * 16 + 3 * 4 + 3}


def test_select_inter_mode_slot_pressure_to_patch():
    from arrow_h264_tpu.models.pipeline import select_inter_mode
    from arrow_h264_tpu.ops.synthetic import synthetic_abi_p
    abi = synthetic_abi_p(MB_W, MB_H, seed=4, n_slots=4, n_mv=8)
    # a 5th slot on two cells: evicted to patch, not a gather demotion
    abi["kind"][2] = abi["kind"][3] = 4
    abi["refslot"][2, ..., 0] = np.maximum(abi["refslot"][2, ..., 0], 0)
    abi["refslot"][3, ..., 0] = np.maximum(abi["refslot"][3, ..., 0], 0)
    abi["refslot"][2, 1, 1, 0] = 9
    abi["refslot"][3, 0, 2, 0] = 9
    m, sl, patch = select_inter_mode(abi, MB_W, MB_H)
    assert m == "pl0p"
    assert 9 not in set(sl.tolist())
    got = set(patch[patch >= 0].tolist())
    assert got == {2 * 16 + 1 * 4 + 1, 3 * 16 + 0 * 4 + 2}


@pytest.mark.parametrize("lists,weighted", [
    ((0,), False), ((0, 1), True),
])
def test_mc_patch_matches_gather(lists, weighted):
    """Frame with ~5% wild cells: hybrid pl*p output == full gather."""
    from arrow_h264_tpu.models.pipeline import _mc_pred, select_inter_mode

    rng = np.random.default_rng(11 + len(lists))
    dpb_y4, dpb_cb, dpb_cr, y4p, cps = make_dpb(rng)
    abi_np = make_abi(rng, lists=lists, weighted=weighted)
    n = MB_W * MB_H
    # wild MVs on ~5% of cells (far outside the DX/DY envelope but inside
    # the padded planes' clamp region after edge extension)
    wild = rng.random((n, 4, 4)) < 0.05
    wmv = rng.integers(-500, 500, (n, 4, 4, 2, 2)).astype(np.int32)
    abi_np["mv"] = np.where(wild[..., None, None], wmv, abi_np["mv"])
    abi = _full_abi(abi_np)
    mode, sl, patch = select_inter_mode(abi, MB_W, MB_H)
    assert mode == ("pl0p" if lists == (0,) else "pl01p")
    abi["patch"] = patch
    abi_j = {k: jnp.asarray(v) for k, v in abi.items()}
    got = _mc_pred(abi_j, y4p, cps, jnp.asarray(sl), mb_w=MB_W, mb_h=MB_H,
                   pallas=True, inter_mode=mode)
    ref = _mc_pred(abi_j, y4p, cps, jnp.asarray(sl), mb_w=MB_W, mb_h=MB_H,
                   pallas=False, inter_mode="gather")
    used = (abi_np["refslot"] >= 0).any(-1)
    m = used.reshape(MB_H, MB_W, 4, 4).transpose(0, 2, 1, 3) \
        .reshape(MB_H * 4, MB_W * 4)
    masks = (np.repeat(np.repeat(m, 4, 0), 4, 1),
             np.repeat(np.repeat(m, 2, 0), 2, 1),
             np.repeat(np.repeat(m, 2, 0), 2, 1))
    for g, r, msk, name in zip(got, ref, masks, ("y", "cb", "cr")):
        bad = (np.asarray(g) != np.asarray(r)) & msk
        assert not bad.any(), (name, np.argwhere(bad)[:4])


def test_mc_pallas_batch_matches_single():
    """B=3 batched (stream, band)-grid kernel == per-stream B=1 calls."""
    from arrow_h264_tpu.ops.pallas.mc_kernel import inter_predict_pallas_batch

    B = 3
    abis, dpbs_y, dpbs_c, singles = [], [], [], []
    slots = [0, 1, 2, -1]
    for b in range(B):
        rng = np.random.default_rng(900 + b)
        _, _, _, y4p, cps = make_dpb(rng)
        abi_np = make_abi(rng, lists=(0, 1), weighted=(b % 2 == 1))
        abi = {k: jnp.asarray(v) for k, v in abi_np.items()}
        singles.append(inter_predict_pallas(
            abi, y4p, cps, slots, MB_W, MB_H, lists=(0, 1)))
        abis.append(abi)
        dpbs_y.append(y4p)
        dpbs_c.append(cps)
    abi_b = {k: jnp.stack([a[k] for a in abis])
             for k in ("mv", "refslot", "wp", "logwd")}
    got = inter_predict_pallas_batch(
        abi_b, jnp.stack(dpbs_y), jnp.stack(dpbs_c),
        jnp.asarray(np.tile(np.array(slots, np.int32), (B, 1))),
        MB_W, MB_H, lists=(0, 1))
    for b in range(B):
        for g, r, name in zip((got[0][b], got[1][b], got[2][b]),
                              singles[b], ("y", "cb", "cr")):
            assert (np.asarray(g) == np.asarray(r)).all(), (b, name)
