"""Feature frontends.

``ConvFrontEnd``: two Conv2d subsampling layers (stride 2 each → ×4 time
reduction) with the reference's exact geometry — time padding 0, freq padding
k//2, mask rule ``mask[:, k//2::stride][:, :T']`` — then flatten C×F and
project to ``output_size`` (reference ``otrans/frontend/conv.py:15-158``).

``ConcatFrontEnd``: frame stacking over (left+right+1) context with a stride
of ``frame_rate/10`` frames (reference ``otrans/frontend/concat.py``),
optionally followed by a Linear.

Both accept [B, T, F] features + bool[B, T] masks and return ([B, T', D],
bool[B, T']).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops.masks import subsample_mask
from .modules import ACTIVATIONS, TorchLinear, torch_bias_init, torch_kernel_init

Dtype = Any


def conv_out_len(t: int, kernel: int, stride: int, padding: int = 0) -> int:
    return (t + 2 * padding - kernel) // stride + 1


class Conv2dSubsampleLayer(nn.Module):
    out_channel: int
    kernel_size: Sequence[int] = (3, 3)
    stride: Sequence[int] = (2, 2)
    dropout: float = 0.0
    batch_norm: bool = False
    residual: bool = False
    act_func_type: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True, train: bool = False):
        # x: [B, T, F, C] (NHWC); mask: bool[B, T]
        kt, kf = int(self.kernel_size[0]), int(self.kernel_size[1])
        st = sf = int(self.stride[0]) if np.ndim(self.stride) else int(self.stride)
        if hasattr(self.stride, "__len__") and len(self.stride) == 2:
            st, sf = int(self.stride[0]), int(self.stride[1])
        residual = x
        in_ch = x.shape[-1]
        h = nn.Conv(
            features=self.out_channel,
            kernel_size=(kt, kf),
            strides=(st, sf),
            padding=((0, 0), (kf // 2, kf // 2)),  # time pad 0, freq pad k//2
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(in_ch * kt * kf),
            dtype=self.dtype,
            name="conv",
        )(x)
        h = ACTIVATIONS[self.act_func_type](h)
        if self.batch_norm:
            h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if self.residual and h.shape == residual.shape:
            h = h + residual
        t_out = h.shape[1]
        mask = subsample_mask(mask, kt, st)[:, :t_out]
        return h, mask


class ConvFrontEnd(nn.Module):
    input_size: int
    output_size: int
    in_channel: int = 1
    mid_channel: int = 32
    out_channel: int = 128
    kernel_size: Sequence[Sequence[int]] = ((3, 3), (3, 3))
    stride: Sequence[int] = (2, 2)
    dropout: float = 0.0
    act_func_type: str = "relu"
    front_end_layer_norm: bool = False
    dtype: Dtype = jnp.float32

    @staticmethod
    def output_length(t: int, kernel_size=((3, 3), (3, 3)), stride=(2, 2)) -> int:
        """Static output frame count for input length t."""
        t1 = conv_out_len(t, int(kernel_size[0][0]), int(stride[0]))
        return conv_out_len(t1, int(kernel_size[1][0]), int(stride[1]))

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True, train: bool = False):
        # x: [B, T, F]; mask: bool[B, T]
        h = x[..., None].astype(self.dtype)  # [B, T, F, 1]
        h, mask = Conv2dSubsampleLayer(
            out_channel=self.mid_channel,
            kernel_size=self.kernel_size[0],
            stride=(self.stride[0], self.stride[0]),
            dropout=self.dropout,
            act_func_type=self.act_func_type,
            dtype=self.dtype,
            name="conv1",
        )(h, mask, deterministic=deterministic, train=train)
        h, mask = Conv2dSubsampleLayer(
            out_channel=self.out_channel,
            kernel_size=self.kernel_size[1],
            stride=(self.stride[1], self.stride[1]),
            dropout=self.dropout,
            act_func_type=self.act_func_type,
            dtype=self.dtype,
            name="conv2",
        )(h, mask, deterministic=deterministic, train=train)
        b, t, f, c = h.shape
        # reference flattens as [B, C, T', F'] -> [B, T', C*F']; NHWC gives
        # [B, T', F', C] — transpose so channel-major flattening matches.
        h = h.transpose(0, 1, 3, 2).reshape(b, t, c * f)
        h = TorchLinear(self.output_size, dtype=self.dtype, name="output_layer")(h)
        if self.front_end_layer_norm:
            h = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(h)
        return h, mask


class ConcatFrontEnd(nn.Module):
    """Frame stacking: concat (left + 1 + right) frames, stride frame_rate/10.

    Reference ``otrans/frontend/concat.py:11-55``.
    """

    input_size: int
    output_size: int
    left_frames: int = 3
    right_frames: int = 0
    frame_rate: int = 30
    with_linear: bool = True
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, *, deterministic: bool = True, train: bool = False):
        b, t, f = x.shape
        ctx = self.left_frames + self.right_frames + 1
        stride = max(self.frame_rate // 10, 1)
        # pad so every window is full (torch Unfold semantics: only full
        # windows are produced → out_t = floor((T - ctx)/stride) + 1)
        out_t = (t - ctx) // stride + 1
        idx = np.arange(out_t)[:, None] * stride + np.arange(ctx)[None, :]  # [T', ctx]
        h = x[:, idx.reshape(-1), :].reshape(b, out_t, ctx * f)
        mask = mask[:, self.left_frames :: stride][:, :out_t]
        if self.with_linear:
            h = TorchLinear(self.output_size, dtype=self.dtype, name="output_layer")(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return h, mask
