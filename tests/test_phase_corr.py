"""Phase-correlation op vs cv2.phaseCorrelate (alignment.cpp:369-388 init)."""

import numpy as np
import jax.numpy as jnp
import pytest

from video_stabilizer_tpu.ops.phase_corr import phase_correlate
from conftest import natural_image

cv2 = pytest.importorskip("cv2")


def shifted_pair(shift, h=96, w=128, seed=5):
    img = natural_image(h + 32, w + 32, seed=seed).astype(np.float32)
    a = img[16 : 16 + h, 16 : 16 + w]
    b = img[16 - shift[1] : 16 - shift[1] + h, 16 - shift[0] : 16 - shift[0] + w]
    return a, b


@pytest.mark.parametrize("shift", [(3, 0), (0, -4), (5, 2), (-6, -3)])
def test_matches_cv2_convention(shift):
    a, b = shifted_pair(shift)
    got, resp = phase_correlate(jnp.asarray(a), jnp.asarray(b))
    cv_shift, cv_resp = cv2.phaseCorrelate(a.astype(np.float64),
                                           b.astype(np.float64))
    got = np.asarray(got)
    # Our convention is the NEGATIVE of cv2 5.x's (see ops/phase_corr.py:
    # the reference's init formula assumes the align-back sign).
    assert abs(got[0] + cv_shift[0]) < 0.35, (got, cv_shift)
    assert abs(got[1] + cv_shift[1]) < 0.35, (got, cv_shift)
    # cv2 recovers the injected content displacement; we its negation.
    # (loose tolerance: the octave texture aliases phase correlation by up
    # to ~1px — cv2 shows the same deviation on this fixture)
    assert abs(got[0] + shift[0]) < 1.5
    assert abs(got[1] + shift[1]) < 1.5


def test_identical_images_zero_shift():
    a, _ = shifted_pair((0, 0))
    got, resp = phase_correlate(jnp.asarray(a), jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=0.1)
    assert float(resp) > 0.1


def test_phase_correlate_aligner_mode():
    """Aligner with phase_correlate=True still recovers motion (streaming
    and batched paths)."""
    import jax.numpy as jnp

    from video_stabilizer_tpu import AlignerParams
    from video_stabilizer_tpu import transforms as T
    from video_stabilizer_tpu.models import VideoAligner
    from video_stabilizer_tpu.models.batch import align_clip

    h, w = 144, 192
    img = natural_image(h + 40, w + 40, seed=9)
    frames = [img[10 : 10 + h, 10 + 3 * k : 10 + 3 * k + w] for k in range(6)]

    params = AlignerParams(phase_correlate=True)
    al = VideoAligner(params)
    meas = []
    for f in frames:
        t, ok = al.align_next_frame(jnp.asarray(f))
        if bool(ok):
            meas.append(float(np.asarray(t)[2]))
    assert len(meas) >= 4
    for tx in meas:
        assert -4.0 < tx < -2.0, meas  # content moves left 3px/frame

    t_b, ok_b = align_clip(np.stack(frames), params)
    t_b = np.asarray(t_b)
    for k in range(1, 6):
        assert -4.0 < t_b[k][2] < -2.0, t_b
