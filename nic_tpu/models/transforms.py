"""The four convolutional transforms of the mean-scale hyperprior model.

Architecture parity with /root/reference/nn_models.py:
  AnalysisTransform            nn_models.py:5-36   (4x 5x5/down2, GDN, last linear)
  SynthesisTransform           nn_models.py:39-70  (4x 5x5/up2, IGDN, last 3ch linear)
  HyperAnalysisTransform       nn_models.py:73-103 (3x3/s1 + 5x5/down2 x2, relu,
                                                    last bias-free linear)
  HyperSynthesisTransform      nn_models.py:106-136 (unused symmetric variant)
  MBT2018HyperSynthesisTransform nn_models.py:140-170 (5x5/up2 N -> 5x5/up2 1.5N
                                                    -> 3x3/s1 out, relu)

Down/up factors: g_a downsamples 16x, h_a another 4x (total 64x); all scripts
rely on these strides for shape bookkeeping.
"""

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from nic_tpu.models.layers import GDN, SignalConv


class AnalysisTransform(nn.Module):
    """Image -> latent encoder g_a (nn_models.py:5-36)."""

    num_filters: int
    dtype: Any = jnp.float32
    use_pallas_gdn: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = SignalConv(self.num_filters, (5, 5), strides_down=2,
                           dtype=self.dtype, name=f"layer_{i}")(x)
            x = GDN(dtype=self.dtype, use_pallas=self.use_pallas_gdn,
                    name=f"gdn_{i}")(x)
        x = SignalConv(self.num_filters, (5, 5), strides_down=2,
                       dtype=self.dtype, name="layer_3")(x)
        return x.astype(jnp.float32)


class SynthesisTransform(nn.Module):
    """Latent -> image decoder g_s (nn_models.py:39-70)."""

    num_filters: int
    dtype: Any = jnp.float32
    use_pallas_gdn: bool = False
    upsample_impl: str = "transpose"
    # None or 'int8': dynamic W8A8 forward for the three N->N upsampling
    # layers (~95% of g_s FLOPs); the final 192->3 output layer stays bf16
    # (negligible FLOPs, pixel-facing precision).
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, y, block_space: bool = False):
        for i in range(3):
            y = SignalConv(self.num_filters, (5, 5), strides_up=2,
                           dtype=self.dtype, upsample_impl=self.upsample_impl,
                           quant=self.quant, name=f"layer_{i}")(y)
            y = GDN(inverse=True, dtype=self.dtype,
                    use_pallas=self.use_pallas_gdn, name=f"igdn_{i}")(y)
        # Note: routing this 192->3 layer through the full subpixel rewrite
        # was benchmarked at -2% end-to-end; XLA's transposed-conv emitters
        # handle it well in the *forward*. block_space=True instead returns
        # the last layer's output in 2x2-block space (12 channels, no
        # depth-to-space) for reorder-invariant losses.
        y = SignalConv(3, (5, 5), strides_up=2, dtype=self.dtype,
                       upsample_impl=self.upsample_impl, name="layer_3")(
            y, block_space_output=block_space
        )
        return y.astype(jnp.float32)


class HyperAnalysisTransform(nn.Module):
    """y -> z hyper-encoder h_a (nn_models.py:73-103).

    ``num_output_filters`` doubles to 2N for the bits-back models, which emit
    a posterior mean and log-variance (mbt2018_bb.py:58).
    """

    num_filters: int
    num_output_filters: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y):
        out = self.num_output_filters or self.num_filters
        y = nn.relu(SignalConv(self.num_filters, (3, 3), strides_down=1,
                               dtype=self.dtype, name="layer_0")(y))
        y = nn.relu(SignalConv(self.num_filters, (5, 5), strides_down=2,
                               dtype=self.dtype, name="layer_1")(y))
        y = SignalConv(out, (5, 5), strides_down=2, use_bias=False,
                       dtype=self.dtype, name="layer_2")(y)
        return y.astype(jnp.float32)


class HyperSynthesisTransform(nn.Module):
    """Symmetric z -> (mu, sigma) decoder variant (nn_models.py:106-136).

    Kept for API parity; the models actually use MBT2018HyperSynthesisTransform.
    """

    num_filters: int
    num_output_filters: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        out = self.num_output_filters or self.num_filters
        z = nn.relu(SignalConv(self.num_filters, (5, 5), strides_up=2,
                               dtype=self.dtype, name="layer_0")(z))
        z = nn.relu(SignalConv(self.num_filters, (5, 5), strides_up=2,
                               dtype=self.dtype, name="layer_1")(z))
        z = SignalConv(out, (3, 3), strides_up=1, dtype=self.dtype, name="layer_2")(z)
        return z.astype(jnp.float32)


class MBT2018HyperSynthesisTransform(nn.Module):
    """z -> (mu, sigma) decoder used everywhere (nn_models.py:140-170).

    Middle layer widens to 1.5N channels per Table 1 of Minnen et al. 2018.
    """

    num_filters: int
    num_output_filters: Optional[int] = None
    dtype: Any = jnp.float32
    upsample_impl: str = "transpose"
    # None or 'int8': dynamic W8A8 forward for the two upsampling layers;
    # the final 3x3 layer emits (mu, sigma) for the rate term and stays bf16.
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, z):
        out = self.num_output_filters or self.num_filters
        z = nn.relu(SignalConv(self.num_filters, (5, 5), strides_up=2,
                               dtype=self.dtype, upsample_impl=self.upsample_impl,
                               quant=self.quant, name="layer_0")(z))
        z = nn.relu(
            SignalConv(int(self.num_filters * 1.5), (5, 5), strides_up=2,
                       dtype=self.dtype, upsample_impl=self.upsample_impl,
                       quant=self.quant, name="layer_1")(z)
        )
        z = SignalConv(out, (3, 3), strides_up=1, dtype=self.dtype, name="layer_2")(z)
        return z.astype(jnp.float32)
