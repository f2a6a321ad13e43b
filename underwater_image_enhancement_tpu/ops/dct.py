"""2-D orthonormal DCT-II (cv2.dct semantics) as two MXU matmuls.

Used by the frequency features (feature_extraction.py:122-158).  cv2.dct
computes the orthonormal DCT-II; we build the basis matrices once per shape
and contract on the MXU — O(H*W*(H+W)) FLOPs, which the MXU eats for
breakfast (a 1080p DCT is ~6 GFLOP ≈ 0.1 ms).

Note: cv2.dct only accepts even-sized arrays; the reference's try/except at
feature_extraction.py:274-278 silently DROPS the 5 frequency features for
odd sizes (changing the vector length!).  We compute the DCT for any size —
the documented happy-path behavior (SURVEY.md F6).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m.astype(np.float32)


from functools import partial


@partial(jax.jit, static_argnames=("precision",))
def dct2(x: jnp.ndarray, precision: str = "highest") -> jnp.ndarray:
    """(H, W) float32 -> orthonormal 2-D DCT-II, == cv2.dct.

    precision='highest' (default, the parity tier) runs the fp32
    multi-pass MXU decomposition; 'default' runs single-pass bf16 inputs —
    ~1e-3 relative coefficient error, fine for the throughput tier's band
    ENERGY ratios and |DCT| moments and several times cheaper at 1080p."""
    H, W = x.shape
    dh = jnp.asarray(_dct_matrix(H))
    dw = jnp.asarray(_dct_matrix(W))
    hp = (jax.lax.Precision.HIGHEST if precision == "highest"
          else jax.lax.Precision.DEFAULT)
    return jnp.dot(jnp.dot(dh, x, precision=hp), dw.T, precision=hp)
