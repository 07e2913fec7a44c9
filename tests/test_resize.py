"""Resize-op tests: both implementations must match torch's bilinear in both
align_corners modes, and the gather form must equal the matmul form."""
import numpy as np
import pytest

import jax.numpy as jnp

from yolact_minimal_tpu.ops.resize import (resize_bilinear,
                                           resize_bilinear_hw_last,
                                           upsample_bilinear_gather)


@pytest.mark.parametrize('align', [False, True])
@pytest.mark.parametrize('in_s,out_s', [(17, 34), (34, 17), (68, 136), (13, 50)])
def test_matches_torch(rng, align, in_s, out_s):
    import torch
    import torch.nn.functional as F
    x = rng.normal(size=(2, in_s, in_s, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_s, out_s,
                                      align_corners=align))
    t = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    theirs = F.interpolate(t, (out_s, out_s), mode='bilinear',
                           align_corners=align).numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=5e-5)


@pytest.mark.parametrize('align', [False, True])
def test_gather_equals_matmul(rng, align):
    x = rng.normal(size=(5, 34, 34)).astype(np.float32)
    a = np.asarray(resize_bilinear_hw_last(jnp.asarray(x), 136, 136,
                                           align_corners=align))
    b = np.asarray(upsample_bilinear_gather(jnp.asarray(x), 136, 136,
                                            align_corners=align))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
