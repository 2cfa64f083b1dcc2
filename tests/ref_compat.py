"""Import harness for the PyTorch reference at /root/reference.

The reference unconditionally imports GPU-only libraries (xformers,
blobfile, flash_attn) that are absent in this CPU image.  This module
installs minimal numerically-exact stand-ins into ``sys.modules`` so the
reference architecture classes can be INSTANTIATED on CPU and used as
numeric ground truth for the torch→jax checkpoint converter tests.

Nothing here copies reference code; the stubs only reimplement the
public xformers API surface (memory_efficient_attention = exact SDPA).
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = '/root/reference'


def _register(name, mod):
    import importlib.machinery
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None,
                                                  is_package=True)
    mod.__path__ = []
    sys.modules[name] = mod


def _install_xformers_stub():
    import torch
    import torch.nn.functional as F

    xformers = types.ModuleType('xformers')
    ops = types.ModuleType('xformers.ops')

    def memory_efficient_attention(q, k, v, attn_bias=None, op=None,
                                   p: float = 0.0, scale=None):
        # xformers accepts (B, M, H, K) 4D or (B*H, M, K) 3D layouts.
        three_d = q.dim() == 3
        if three_d:
            q_, k_, v_ = (t.unsqueeze(1) for t in (q, k, v))  # (B*H,1,M,K)
        else:
            q_, k_, v_ = (t.transpose(1, 2) for t in (q, k, v))
        mask = attn_bias
        out = F.scaled_dot_product_attention(q_, k_, v_, attn_mask=mask,
                                             scale=scale)
        if three_d:
            return out.squeeze(1)
        return out.transpose(1, 2)

    def unbind(x, dim=0):
        return torch.unbind(x, dim)

    ops.memory_efficient_attention = memory_efficient_attention
    ops.unbind = unbind
    ops.MemoryEfficientAttentionFlashAttentionOp = None
    fmha = types.ModuleType('xformers.ops.fmha')

    class BlockDiagonalMask:  # only referenced, never built on CPU paths
        pass

    fmha.BlockDiagonalMask = BlockDiagonalMask
    ops.fmha = fmha
    xformers.ops = ops
    _register('xformers', xformers)
    _register('xformers.ops', ops)
    _register('xformers.ops.fmha', fmha)


def _patch_gated_xformers_symbols():
    """``dit/dit_models_xformers.py`` imports ``fused_mlp``/``Activation``
    only when CUDA is available but uses them unconditionally at module
    construction.  Inject CPU stand-ins post-import (exact math; FusedMLP
    keeps xformers' ``mlp.0``/``mlp.2`` Linear key naming)."""
    import enum

    import torch.nn as nn

    class Activation(str, enum.Enum):
        GeLU = 'gelu'
        ReLU = 'relu'
        SquaredReLU = 'squared_relu'

    def build_activation(act):
        return {'gelu': nn.GELU(), 'relu': nn.ReLU()}[
            act.value if isinstance(act, Activation) else act]

    class _FusedDropoutBias(nn.Module):
        def __init__(self, p, bias_shape, activation=None):
            super().__init__()
            self.act = build_activation(activation) if activation \
                else nn.Identity()
            self.drop = nn.Dropout(p)

        def forward(self, x):
            return self.drop(self.act(x))

    class FusedMLP(nn.Module):
        def __init__(self, dim_model, dropout, activation,
                     hidden_layer_multiplier, bias=True, **kw):
            super().__init__()
            dim_mlp = hidden_layer_multiplier * dim_model
            self.mlp = nn.Sequential(
                nn.Linear(dim_model, dim_mlp, bias=bias),
                _FusedDropoutBias(dropout, None, activation),
                nn.Linear(dim_mlp, dim_model, bias=bias),
                _FusedDropoutBias(dropout, None, None),
            )

        def forward(self, x):
            return self.mlp(x)

    fused_mlp_mod = types.SimpleNamespace(FusedMLP=FusedMLP)
    import dit.dit_models_xformers as dmx
    if not hasattr(dmx, 'fused_mlp'):
        dmx.fused_mlp = fused_mlp_mod
        dmx.Activation = Activation
        dmx.build_activation = build_activation


def _install_blobfile_stub():
    bf = types.ModuleType('blobfile')
    bf.BlobFile = open
    bf.join = os.path.join
    bf.listdir = os.listdir
    bf.exists = os.path.exists
    bf.basename = os.path.basename
    bf.dirname = os.path.dirname
    _register('blobfile', bf)


def _install_timm_stub():
    """Functional timm stand-ins with timm's exact state-dict naming
    (PatchEmbed: ``proj.*``; Mlp: ``fc1.*``/``fc2.*``) so converted
    checkpoints keep their key structure."""
    if 'timm' in sys.modules:
        return
    try:
        import timm  # noqa: F401  (real package present)
        return
    except Exception:
        pass
    import torch
    import torch.nn as nn

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True,
                     bias=True, **kw):
            super().__init__()
            self.patch_size = (patch_size, patch_size)
            self.num_patches = (img_size // patch_size)**2
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim,
                                  kernel_size=patch_size,
                                  stride=patch_size, bias=bias)
            self.norm = norm_layer(embed_dim) if norm_layer \
                else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)  # B,C,H,W -> B,N,C
            return self.norm(x)

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, bias=True,
                     drop=0.0, **kw):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    class Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.,
                     proj_drop=0., **kw):
            super().__init__()
            self.num_heads = num_heads
            self.scale = (dim // num_heads)**-0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                      C // self.num_heads)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            x = (attn.softmax(-1) @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    timm = types.ModuleType('timm')
    models = types.ModuleType('timm.models')
    vit = types.ModuleType('timm.models.vision_transformer')
    layers = types.ModuleType('timm.models.layers')
    vit.PatchEmbed = PatchEmbed
    vit.Mlp = Mlp
    vit.Attention = Attention

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.models = models
    models.vision_transformer = vit
    models.layers = layers
    for name, mod in (('timm', timm), ('timm.models', models),
                      ('timm.models.vision_transformer', vit),
                      ('timm.models.layers', layers)):
        _register(name, mod)


STUB_ROOTS = (
    'lpips', 'kornia', 'webdataset', 'point_cloud_utils', 'mcubes',
    'trimesh', 'ffmpeg', 'imageio', 'Imath', 'OpenEXR', 'lmdb', 'rembg',
    'torchvision', 'cv2', 'niqe', 'vision_aided_loss', 'einops_exts',
    'x_transformers', 'positional_encodings', 'torch_efficient_distloss',
    'nvdiffrast', 'open_clip', 'clip', 'sentencepiece', 'kiui',
    'diffusers', 'wandb', 'omegaconf', 'pytorch_lightning', 'einx',
    'torchdiffeq', 'ipdb', 'gradio', 'blobfile2', 'matplotlib',
    'beartype', 'taming', 'transformers_utils', 'accelerate_utils',
)


class _StubLoader:
    """Fabricate importable package stubs for any depth under STUB_ROOTS.

    Attributes resolve to a late-failing class so nothing breaks until a
    stubbed symbol is actually *called* at runtime."""

    # cross-instance marker: the module can be imported both as
    # 'ref_compat' and 'tests.ref_compat' (two class objects) — without
    # this, two installed loaders each defer to the other in the
    # real-installation probe below and BOTH return None
    # (ModuleNotFoundError for every stub root).
    _ln3diff_stub = True

    def find_spec(self, fullname, path=None, target=None):
        import importlib.machinery
        root = fullname.split('.')[0]
        if root not in STUB_ROOTS:
            return None
        try:  # prefer a real installation when present
            import importlib.util
            if root == fullname:
                for finder in sys.meta_path:
                    if finder is self or getattr(finder, '_ln3diff_stub',
                                                 False):
                        continue
                    spec = getattr(finder, 'find_spec', None)
                    if spec and finder.find_spec(fullname, path, target):
                        return None
        except Exception:
            pass
        return importlib.machinery.ModuleSpec(fullname, self,
                                              is_package=True)

    def create_module(self, spec):
        mod = types.ModuleType(spec.name)
        mod.__path__ = []
        # Stubs persist in sys.modules for the whole process, so package
        # code probing optional deps (``try: import lmdb``) would see
        # them and take the present path.  Mark them so those probes
        # (ln3diff_tpu.utils.misc.optional_import) treat them as absent.
        mod.__ln3diff_stub__ = True
        mod.__getattr__ = lambda attr, _n=spec.name: _stub_attr(_n, attr)
        return mod

    def exec_module(self, module):
        pass


def _install_misc_stubs():
    if not any(isinstance(f, _StubLoader) for f in sys.meta_path):
        sys.meta_path.append(_StubLoader())


def _stub_attr(modname, attr):
    # late-failing attribute: only errors if actually called
    if attr.startswith('__'):
        raise AttributeError(attr)

    class _Missing:
        """Late-failing stand-in.  Tolerates import-time *decorator* and
        *subscript* (type-annotation) usage; anything else raises."""

        def __new__(cls, *a, **k):
            if len(a) == 1 and callable(a[0]) and not k:
                return a[0]          # used as a decorator — pass through
            raise ImportError(f'stubbed module {modname}.{attr} used at '
                              'runtime — not available on CPU test image')

        def __class_getitem__(cls, item):
            return cls

    return _Missing


_installed = False


def install():
    """Idempotently install stubs + reference sys.path."""
    global _installed
    if _installed:
        return True
    if not os.path.isdir(REFERENCE_ROOT):
        return False
    _install_xformers_stub()
    _install_blobfile_stub()
    _install_timm_stub()
    _install_misc_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _patch_gated_xformers_symbols()
    _installed = True
    return True


def reference_available() -> bool:
    try:
        return install()
    except Exception:
        return False
