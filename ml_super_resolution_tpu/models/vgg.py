"""VGG19 feature extractor for the SRGAN perceptual loss.

Paper protocol (arXiv:1609.04802 §2.2.1): the "VGG54" content loss is the MSE
between feature maps after the 4th conv *before* activation in the 5th block
(conv5_4 pre-ReLU) of an ImageNet-pretrained VGG19, on images mapped to the
VGG input range, scaled by 1/12.75² to be commensurate with MSE.

Offline-environment note (documented deviation): this image has **zero
network egress and no pretrained VGG weights on disk**, so the extractor
loads weights from a user-supplied file (``.npz`` of HWIO conv kernels, or a
Keras ``vgg19_weights_tf_dim_ordering_tf_kernels_notop.h5``).  With no file
it He-initializes — a random-projection perceptual loss.  Training quality
with random features is below the paper's; drop in real weights via
``--vgg-weights`` for full parity.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# block -> number of convs; VGG19 = 2,2,4,4,4.
_VGG19_LAYOUT = ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4))

# Caffe-VGG19 preprocessing: inputs are BGR in [0,255] minus the ImageNet
# channel means.  Pretrained Keras/caffe conv kernels expect exactly this
# range and channel order — feeding RGB [0,1] mis-scales activations ~255x
# and swaps R/B, making the perceptual loss meaningless.
_MEAN_BGR = np.array([103.939, 116.779, 123.68], dtype=np.float32)


class VGG19Features(nn.Module):
    """Runs VGG19 up to conv``{block}_{conv}`` pre-activation (default 5_4)."""

    stop_block: int = 5
    stop_conv: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (N, H, W, 3) RGB in [0,1] -> caffe range: BGR, [0,255], mean-sub.
        x = x[..., ::-1] * 255.0 - jnp.asarray(_MEAN_BGR, dtype=x.dtype)
        for b, (feats, n_convs) in enumerate(_VGG19_LAYOUT, start=1):
            for c in range(1, n_convs + 1):
                x = nn.Conv(
                    feats, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"conv{b}_{c}",
                )(x)
                if b == self.stop_block and c == self.stop_conv:
                    return x.astype(jnp.float32)  # pre-activation output
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        raise ValueError(f"stop layer conv{self.stop_block}_{self.stop_conv} not reached")


def load_vgg19_params(path: str | Path | None, params_template) -> tuple[dict, bool]:
    """Fill a VGG19Features param tree from a weights file.

    Supported: ``.npz`` with arrays named ``conv{b}_{c}/kernel`` (HWIO) and
    ``conv{b}_{c}/bias``; or a Keras VGG19 no-top ``.h5``.  Returns
    ``(params, pretrained)`` — the template (random init) unchanged when
    ``path`` is None or missing.
    """
    if path is None:
        return params_template, False
    path = Path(path)
    if not path.exists():
        return params_template, False

    import flax

    flat = flax.traverse_util.flatten_dict(params_template)
    if path.suffix == ".npz":
        src = np.load(path)

        def get(b, c, kind):
            return src[f"conv{b}_{c}/{kind}"]

    elif path.suffix in (".h5", ".hdf5"):
        import h5py  # ships with tensorflow

        f = h5py.File(path, "r")

        def get(b, c, kind):
            name = f"block{b}_conv{c}"
            grp = f[name] if name in f else f["model_weights"][name]
            inner = grp[name] if name in grp else grp
            key = "kernel:0" if kind == "kernel" else "bias:0"
            return np.asarray(inner[key])

    else:
        raise ValueError(f"unsupported VGG weights format: {path.suffix}")

    out = {}
    for kpath, val in flat.items():
        # kpath like ('conv5_4', 'kernel')
        layer, kind = kpath[-2], kpath[-1]
        b, c = layer.removeprefix("conv").split("_")
        arr = np.asarray(get(int(b), int(c), kind), dtype=np.float32)
        if arr.shape != val.shape:
            raise ValueError(f"{layer}/{kind}: file {arr.shape} vs model {val.shape}")
        out[kpath] = jnp.asarray(arr)
    return flax.traverse_util.unflatten_dict(out), True
