"""Band-limited random field synthesis (PhiFlow `math.randfreq` equivalent).

Reference call site: burgers initial velocity
`velocity = lambda s: math.randfreq(s) * 2` (/root/reference/burgers/burgers.py:121):
complex gaussian spectrum shaped by (1/(|k|+1))^power * power * sqrt(mean(res)),
inverse-FFT'd to a real field. Drawn per staggered component.
"""

from __future__ import annotations

import numpy as np

from solver_in_the_loop_tpu.core.grids import Domain, StaggeredGrid


def randfreq(rng: np.random.RandomState, shape, power: int = 8) -> np.ndarray:
    """Random smooth field of shape (B, H, W)."""
    b, h, w = shape
    fft = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    # radial frequency in cycles/sample (np.fft.fftfreq units), matching
    # PhiFlow's fftfreq(mode='absolute'): (1/(k+1))^power is a mild low-pass
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    k = np.sqrt(fy**2 + fx**2)
    shape_fac = np.sqrt(0.5 * (h + w))
    fft = fft * ((1.0 / (k + 1.0)) ** power * power * shape_fac)[None]
    return np.real(np.fft.ifft2(fft, axes=(-2, -1))).astype(np.float32)


def randfreq_staggered(rng: np.random.RandomState, domain: Domain, batch: int = 1, scale: float = 2.0) -> StaggeredGrid:
    """Random initial MAC velocity: independent randfreq per component * scale."""
    v = randfreq(rng, domain.v_shape(batch)) * scale
    u = randfreq(rng, domain.u_shape(batch)) * scale
    return domain.staggered_grid(u=u, v=v, batch=batch)
