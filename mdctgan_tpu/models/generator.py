"""pix2pixHD-style generators (Flax, NHWC).

Re-designs of the reference ``GlobalGenerator`` (networks.py:301-372) and
``LocalEnhancer`` (networks.py:173-298).  Structure is kept layer-for-layer so
that pretrained torch checkpoints map 1:1 onto the parameter tree (see
mdctgan_tpu/train/import_torch.py), but the implementation is idiomatic
JAX/Flax: NHWC convs, functional instance norm, static shapes, no module
state outside BatchNorm batch_stats (inside the attention stack only).

Freezing (the reference's ``set_freeze`` / ``niter_fix_global``,
networks.py:269-298, pix2pixHD_model.py:331-343) is not implemented by
mutating modules; use ``mdctgan_tpu.train.freeze.param_labels`` to drive an
optax.multi_transform — the idiomatic JAX equivalent.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mdctgan_tpu.models.attention import BottleStack
from mdctgan_tpu.models.layers import (
    Conv,
    ConvResBlock,
    ConvTransposed,
    InterpolateUpsample,
    PolyphaseConv,
    ResnetBlock,
    avg_pool_3x3_s2,
    instance_norm,
    instance_norm_relu,
    reflect_pad,
)

Array = jax.Array


def _downsample_layer(kind: str, in_f: int, out_f: int, name: str, dtype=None):
    if kind == "conv":
        return Conv(out_f, 3, 2, 1, dtype=dtype, name=name)
    if kind == "resconv":
        return ConvResBlock(in_f, out_f, 3, 2, 1, dtype=dtype, name=name)
    raise NotImplementedError(f"downsample layer [{kind}] is not found")


def _upsample_layer(kind: str, in_f: int, out_f: int, name: str, dtype=None):
    if kind == "transconv":
        return ConvTransposed(out_f, 3, 2, dtype=dtype, name=name)
    if kind == "interpolate":
        return InterpolateUpsample(in_f, out_f, dtype=dtype, name=name)
    raise NotImplementedError(f"upsample layer [{kind}] is not found")


class GlobalGenerator(nn.Module):
    """Coarse generator: 7x7 stem -> n_downsampling strided stages ->
    resblocks with an attention stack spliced in the middle -> mirrored
    upsample -> 7x7 tanh head (networks.py:301-357).

    ``include_head=False`` reproduces the LocalEnhancer's truncated global
    branch (the torch code strips the last 3 layers, networks.py:184-186):
    output is then the ngf-channel feature map after the last upsample stage.
    """

    input_nc: int = 2
    output_nc: int = 1
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    n_attn: int = 0
    input_size: Tuple[int, int] = (128, 256)
    proj_factor: int = 4
    heads: int = 4
    dim_head: int = 128
    downsample_type: str = "conv"
    upsample_type: str = "transconv"
    include_head: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 sample_mask: Optional[Array] = None) -> Array:
        """``sample_mask`` (B,) 0/1: restricts the attention stack's
        BatchNorm batch statistics to the real rows of a padded tail batch
        (train/step.py threads it; every other norm here is per-sample)."""
        ngf = self.ngf
        h = reflect_pad(x, 3)
        h = Conv(ngf, 7, dtype=self.dtype, name="stem")(h)
        h = instance_norm_relu(h)
        for i in range(self.n_downsampling):
            mult = 2 ** i
            h = _downsample_layer(
                self.downsample_type, ngf * mult, ngf * mult * 2, f"down{i}",
                dtype=self.dtype,
            )(h)
            h = instance_norm_relu(h)

        mult = 2 ** self.n_downsampling
        mid = self.n_blocks // 2
        fmap = (self.input_size[0] // mult, self.input_size[1] // mult)
        for i in range(self.n_blocks):
            if i == mid and self.n_attn > 0:
                h = BottleStack(
                    dim_out=ngf * mult,
                    fmap_size=fmap,
                    num_layers=self.n_attn,
                    proj_factor=self.proj_factor,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    dtype=self.dtype,
                    name="attn",
                )(h, train=train, mask=sample_mask)
            h = ResnetBlock(ngf * mult, dtype=self.dtype, name=f"res{i}")(h)
        if self.n_blocks == 0 and self.n_attn > 0:  # attention-only bottleneck
            h = BottleStack(
                dim_out=ngf * mult,
                fmap_size=fmap,
                num_layers=self.n_attn,
                proj_factor=self.proj_factor,
                heads=self.heads,
                dim_head=self.dim_head,
                dtype=self.dtype,
                name="attn",
            )(h, train=train, mask=sample_mask)

        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = _upsample_layer(
                self.upsample_type, ngf * mult, ngf * mult // 2, f"up{i}",
                dtype=self.dtype,
            )(h)
            h = instance_norm_relu(h)
        if not self.include_head:
            return h
        h = reflect_pad(h, 3)
        h = PolyphaseConv(self.output_nc, 7, dtype=self.dtype, name="head")(h)
        return nn.tanh(h.astype(jnp.float32))


class LocalEnhancer(nn.Module):
    """Two-scale generator (networks.py:173-267): a truncated GlobalGenerator
    on the avg-pooled half-resolution input, summed into a full-resolution
    enhancer branch (downsample stem + resblocks [+ optional attention
    bottleneck] + upsample + tanh head)."""

    input_nc: int = 2
    output_nc: int = 1
    ngf: int = 32
    n_downsample_global: int = 3
    n_blocks_global: int = 9
    n_local_enhancers: int = 1
    n_blocks_local: int = 3
    n_attn_global: int = 0
    n_attn_local: int = 0
    input_size: Tuple[int, int] = (128, 256)
    proj_factor_g: int = 4
    heads_g: int = 4
    dim_head_g: int = 128
    proj_factor_l: int = 4
    heads_l: int = 4
    dim_head_l: int = 128
    downsample_type: str = "conv"
    upsample_type: str = "transconv"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 sample_mask: Optional[Array] = None) -> Array:
        """``sample_mask``: see ``GlobalGenerator.__call__``."""
        n_enh = self.n_local_enhancers
        ngf_g = self.ngf * (2 ** n_enh)

        # --- coarse branch on the deepest avg-pooled pyramid level --------
        # (networks.py:253-260; for n_enh > 1 the pyramid follows upstream
        # pix2pixHD — the reference fork hardcodes ONE enhancer branch and
        # its forward cannot run N != 1, so N > 1 generalizes upstream's
        # model%d_1 loop with this fork's block types.)
        levels = [x]
        for _ in range(n_enh):
            levels.append(avg_pool_3x3_s2(levels[-1]))
        coarse = GlobalGenerator(
            input_nc=self.input_nc,
            output_nc=self.output_nc,
            ngf=ngf_g,
            n_downsampling=self.n_downsample_global,
            n_blocks=self.n_blocks_global,
            n_attn=self.n_attn_global,
            input_size=(self.input_size[0] // (2 ** n_enh),
                        self.input_size[1] // (2 ** n_enh)),
            proj_factor=self.proj_factor_g,
            heads=self.heads_g,
            dim_head=self.dim_head_g,
            downsample_type=self.downsample_type,
            upsample_type=self.upsample_type,
            include_head=False,
            dtype=self.dtype,
            name="global",
        )(levels[-1], train=train, sample_mask=sample_mask)

        # --- enhancer branches, coarse to fine ----------------------------
        h = coarse
        for n in range(1, n_enh + 1):
            h = self._enhancer_branch(
                h, levels[n_enh - n],
                ngf_l=self.ngf * (2 ** (n_enh - n)),
                branch_size=(self.input_size[0] // (2 ** (n_enh - n)),
                             self.input_size[1] // (2 ** (n_enh - n))),
                # the finest branch keeps the legacy (un-prefixed) module
                # names so n_enh=1 checkpoints stay loadable
                prefix="" if n == n_enh else f"enh{n}_",
                with_head=(n == n_enh),
                train=train,
                sample_mask=sample_mask,
            )
        return h

    def _enhancer_branch(
        self,
        coarse: Array,
        x: Array,
        ngf_l: int,
        branch_size: Tuple[int, int],
        prefix: str,
        with_head: bool,
        train: bool,
        sample_mask: Optional[Array] = None,
    ) -> Array:
        """One enhancer branch (networks.py:204-247): downsample stem, add
        the coarser branch's features, refine (+ optional attention
        bottleneck), upsample; the finest branch ends in the tanh head."""
        # stem is NOT phased: a step trace showed the reflect-padded stem's
        # phased form pays more in un-interleave + bias-grad formatting than
        # the conv saves (docs/PERFORMANCE.md).
        h = reflect_pad(x, 3)
        h = Conv(ngf_l, 7, dtype=self.dtype, name=f"{prefix}local_stem")(h)
        h = instance_norm_relu(h)
        h = _downsample_layer(
            self.downsample_type, ngf_l, ngf_l * 2, f"{prefix}local_down",
            dtype=self.dtype,
        )(h)
        h = instance_norm_relu(h)

        # --- fuse and refine (networks.py:265-266: add, then upsample branch)
        h = h + coarse

        def attn_bottleneck(h: Array) -> Array:
            # 8x downsample -> attention (networks.py:218-237); fmap = branch
            # input size // 16.
            # NB the torch code builds the 2nd/3rd down stage and all 3 up
            # stages via list multiplication `[layer, ...]*k`, which repeats
            # the SAME module -> shared weights; reproduced here by calling
            # one module instance multiple times.
            h = _downsample_layer(
                self.downsample_type, ngf_l * 2, ngf_l,
                f"{prefix}local_attn_down0", dtype=self.dtype,
            )(h)
            h = instance_norm_relu(h)
            shared_down = _downsample_layer(
                self.downsample_type, ngf_l, ngf_l,
                f"{prefix}local_attn_down_shared", dtype=self.dtype,
            )
            for _ in range(2):
                h = instance_norm_relu(shared_down(h))
            return BottleStack(
                dim_out=ngf_l * 2,
                fmap_size=(branch_size[0] // 16, branch_size[1] // 16),
                num_layers=self.n_attn_local,
                proj_factor=self.proj_factor_l,
                heads=self.heads_l,
                dim_head=self.dim_head_l,
                dtype=self.dtype,
                name=f"{prefix}local_attn",
            )(h, train=train, mask=sample_mask)

        mid = self.n_blocks_local // 2
        for i in range(self.n_blocks_local):
            if i == mid and self.n_attn_local > 0:
                h = attn_bottleneck(h)
            h = ResnetBlock(
                ngf_l * 2, dtype=self.dtype, name=f"{prefix}local_res{i}"
            )(h)
        if self.n_blocks_local == 0 and self.n_attn_local > 0:
            # the reference's list-insert still places the bottleneck when
            # there are no resblocks to insert between
            h = attn_bottleneck(h)
        if self.n_attn_local > 0:
            shared_up = _upsample_layer(
                self.upsample_type, ngf_l * 2, ngf_l * 2,
                f"{prefix}local_attn_up_shared", dtype=self.dtype,
            )
            for _ in range(3):
                h = instance_norm_relu(shared_up(h))
        h = _upsample_layer(
            self.upsample_type, ngf_l * 2, ngf_l, f"{prefix}local_up",
            dtype=self.dtype,
        )(h)
        h = instance_norm_relu(h)
        if not with_head:
            # intermediate branches feed the next branch directly (upstream
            # pix2pixHD: only the last branch carries the conv7+tanh head)
            return h
        h = reflect_pad(h, 3)
        h = PolyphaseConv(
            self.output_nc, 7, dtype=self.dtype, name=f"{prefix}local_head"
        )(h)
        return nn.tanh(h.astype(jnp.float32))


def build_generator(opt) -> nn.Module:
    """Factory mirroring networks.define_G (networks.py:33-56) from a parsed
    options namespace/dict."""
    get = (lambda k, d=None: getattr(opt, k, d)) if not isinstance(opt, dict) else opt.get
    input_size = (get("bins", 128), get("n_fft", 512) // 2)
    kind = get("netG", "global")
    common = dict(
        input_nc=get("input_nc", 2),
        output_nc=get("output_nc", 1),
        ngf=get("ngf", 64),
        input_size=input_size,
        downsample_type=get("downsample_type", "conv"),
        upsample_type=get("upsample_type", "transconv"),
        dtype=jnp.bfloat16 if get("fp16", False) else None,
    )
    if kind == "global":
        return GlobalGenerator(
            n_downsampling=get("n_downsample_global", 3),
            n_blocks=get("n_blocks_global", 9),
            n_attn=get("n_blocks_attn_g", 0),
            proj_factor=get("proj_factor_g", 4),
            heads=get("heads_g", 4),
            dim_head=get("dim_head_g", 128),
            **common,
        )
    if kind == "local":
        return LocalEnhancer(
            n_downsample_global=get("n_downsample_global", 3),
            n_blocks_global=get("n_blocks_global", 9),
            n_local_enhancers=get("n_local_enhancers", 1),
            n_blocks_local=get("n_blocks_local", 3),
            n_attn_global=get("n_blocks_attn_g", 0),
            n_attn_local=get("n_blocks_attn_l", 0),
            proj_factor_g=get("proj_factor_g", 4),
            heads_g=get("heads_g", 4),
            dim_head_g=get("dim_head_g", 128),
            proj_factor_l=get("proj_factor_l", 4),
            heads_l=get("heads_l", 4),
            dim_head_l=get("dim_head_l", 128),
            **common,
        )
    raise ValueError(f"generator [{kind}] not implemented")
