"""Phase-batched Pallas intra kernel vs the XLA wavefront oracle.

Fully randomized ABIs (all kinds incl. I8x8/PCM/inter passthrough, random
modes and avails) across geometries with distinct phase counts and non-pow2
widths (the 720p-class bug surface, SURVEY.md §4.2), on the CPU interpreter.

PCM residuals are generated in [0,255]: the ABI contract is that `res`
carries the raw PCM samples for IPCM MBs (spec 8.3.5 — already in pixel
range, no clip), so out-of-range PCM "residuals" are outside the contract
(the oracle passes them through; the kernel clips).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from arrow_h264_tpu.ops.intra import intra_reconstruct
from arrow_h264_tpu.ops.pallas.intra_phase import intra_phase_batch


def rand_abi(mb_w, mb_h, seed):
    rng = np.random.default_rng(seed)
    n = mb_w * mb_h
    return dict(
        kind=rng.choice([0, 1, 2, 3, 4], n,
                        p=[.3, .25, .2, .05, .2]).astype(np.int32),
        i4_modes=rng.integers(0, 9, (n, 16)).astype(np.int32),
        i4_avail=rng.integers(0, 2, (n, 16, 4)).astype(np.int32),
        i8_modes=rng.integers(0, 9, (n, 4)).astype(np.int32),
        i8_avail=rng.integers(0, 2, (n, 4, 4)).astype(np.int32),
        i16_mode=rng.integers(0, 4, n).astype(np.int32),
        chroma_mode=rng.integers(0, 4, n).astype(np.int32),
        mb_avail=rng.integers(0, 2, (n, 3)).astype(np.int32),
    )


@pytest.mark.parametrize("mb_w,mb_h", [(5, 4), (3, 7), (9, 2)])
def test_intra_phase_equivalence(mb_w, mb_h):
    B = 3
    H, W = mb_h * 16, mb_w * 16
    rng = np.random.default_rng(99)
    abis = [rand_abi(mb_w, mb_h, 10 * mb_w + i) for i in range(B)]
    res_y = rng.integers(-300, 300, (B, H, W)).astype(np.int32)
    res_cb = rng.integers(-100, 100, (B, H // 2, W // 2)).astype(np.int32)
    res_cr = rng.integers(-100, 100, (B, H // 2, W // 2)).astype(np.int32)
    for i, a in enumerate(abis):
        pcm = a["kind"].reshape(mb_h, mb_w) == 3
        for yy, xx in zip(*np.nonzero(pcm)):
            res_y[i, yy * 16:yy * 16 + 16, xx * 16:xx * 16 + 16] %= 256
            res_cb[i, yy * 8:yy * 8 + 8, xx * 8:xx * 8 + 8] %= 256
            res_cr[i, yy * 8:yy * 8 + 8, xx * 8:xx * 8 + 8] %= 256
    init_y = rng.integers(0, 256, (B, H, W)).astype(np.int32)
    init_cb = rng.integers(0, 256, (B, H // 2, W // 2)).astype(np.int32)
    init_cr = rng.integers(0, 256, (B, H // 2, W // 2)).astype(np.int32)

    exp = [intra_reconstruct({k: jnp.asarray(v) for k, v in a.items()},
                             jnp.asarray(res_y[i]), jnp.asarray(res_cb[i]),
                             jnp.asarray(res_cr[i]), mb_w, mb_h,
                             jnp.asarray(init_y[i]), jnp.asarray(init_cb[i]),
                             jnp.asarray(init_cr[i]))
           for i, a in enumerate(abis)]
    abi_b = {k: jnp.asarray(np.stack([a[k] for a in abis])) for k in abis[0]}
    got = intra_phase_batch(abi_b, jnp.asarray(res_y), jnp.asarray(res_cb),
                            jnp.asarray(res_cr), jnp.asarray(init_y),
                            jnp.asarray(init_cb), jnp.asarray(init_cr),
                            mb_w, mb_h)
    for i in range(B):
        for pi, (g, e) in enumerate(zip([got[0][i], got[1][i], got[2][i]],
                                        exp[i])):
            g, e = np.asarray(g), np.asarray(e)
            np.testing.assert_array_equal(g, e[:g.shape[0], :g.shape[1]],
                                          err_msg=f"stream {i} plane {pi}")
