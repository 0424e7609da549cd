"""dynamic_mask_with_coords: the split-einsum layer 0 (shared feature map
contracted directly per query) must equal the naive formulation that
materializes the q-fold broadcast+concat input (reference
tce_rvos.py:426-510 semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp
from flax import linen as nn

from tce_rvos_tpu.models.dynamic_head import (
    compute_locations,
    dynamic_head_param_counts,
    dynamic_mask_with_coords,
)


def _naive(mask_features, params, reference_points, sizes, channels,
           num_layers, rel_coord, mask_feat_stride=4, mask_out_stride=4):
    b, t, h, w, c = mask_features.shape
    q = params.shape[2]
    in_ch = c + 2 if rel_coord else c
    weight_nums, bias_nums = dynamic_head_param_counts(
        c, channels, num_layers, rel_coord)

    feats = jnp.broadcast_to(mask_features[:, :, None], (b, t, q, h, w, c))
    if rel_coord:
        scale = jnp.stack([sizes[:, 1], sizes[:, 0]], -1).astype(jnp.float32)
        ref_abs = reference_points * scale[:, None, None, :]
        locations = compute_locations(h, w, stride=mask_feat_stride)
        rel = ref_abs[:, :, :, None, None, :] - locations[None, None, None]
        feats = jnp.concatenate(
            [feats, rel.astype(mask_features.dtype)], axis=-1)

    splits = np.cumsum(np.array(weight_nums + bias_nums))[:-1].tolist()
    pieces = jnp.split(params, splits, axis=-1)
    ws, bs = pieces[:num_layers], pieces[num_layers:]
    x, cin = feats, in_ch
    for l in range(num_layers):
        cout = 1 if l == num_layers - 1 else channels
        wl = ws[l].reshape(b, t, q, cout, cin)
        bl = bs[l].reshape(b, t, q, cout)
        x = jnp.einsum("btqhwi,btqoi->btqhwo", x, wl) \
            + bl[:, :, :, None, None, :]
        if l < num_layers - 1:
            x = nn.relu(x)
        cin = cout
    return x[..., 0]


@pytest.mark.parametrize("rel_coord", [True, False])
@pytest.mark.parametrize("num_layers", [2, 3])
def test_split_einsum_matches_naive_broadcast(rel_coord, num_layers):
    rng = np.random.default_rng(0)
    b, t, q, h, w, c, channels = 2, 3, 4, 6, 8, 5, 4
    wn, bn = dynamic_head_param_counts(c, channels, num_layers, rel_coord)
    mask_features = jnp.asarray(
        rng.standard_normal((b, t, h, w, c)), jnp.float32)
    params = jnp.asarray(
        rng.standard_normal((b, t, q, sum(wn) + sum(bn))), jnp.float32)
    refs = jnp.asarray(rng.uniform(0, 1, (b, t, q, 2)), jnp.float32)
    sizes = jnp.asarray([[4 * h, 4 * w]] * b, jnp.float32)

    got = dynamic_mask_with_coords(
        mask_features, params, refs, sizes, channels, num_layers,
        rel_coord=rel_coord)
    want = _naive(
        mask_features, params, refs, sizes, channels, num_layers, rel_coord)
    # mask_feat_stride == mask_out_stride here, so no resize on either side
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
