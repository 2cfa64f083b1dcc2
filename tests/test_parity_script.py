"""End-to-end self-test of ``scripts/parity_vs_reference.py``.

Writes a SMALL synthetic joint checkpoint in the reference's own
on-disk format — the actual reference torch modules (``dit/``, ``vit/``,
``ldm/``, ``nsr/`` classes assembled per ``nsr/script_util.py:25-377``),
state-dicted under the ``ddpm_model.`` / ``rec_model.`` prefixes of
``guided_diffusion/fp16_util.py:299-303`` — then runs the full parity
harness on it and asserts every stage agrees, proving weight-day is
turnkey: converters, reference re-instantiation, deterministic render
comparison and LPIPS all compose from one file path.
"""

import os
import sys

import numpy as np
import pytest

import ref_compat

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not ref_compat.reference_available(),
                                 reason='/root/reference not present')]

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                'scripts'))


def _randomize(torch, module, seed):
    """Randomize every TRAINABLE parameter.  requires_grad=False params
    (e.g. DiT_TriLatent's frozen sincos pos_embed, dit_trilatent.py:53)
    keep their init, exactly as a trained reference checkpoint would."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            if p.requires_grad:
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)


def write_synthetic_joint(path: str, arch) -> dict:
    """Instantiate the reference modules at ``arch`` size, randomize,
    and save a joint checkpoint exactly as the reference persists it."""
    import torch
    from dit.dit_models_xformers import TextCondDiTBlock
    from dit.dit_trilatent import DiT_TriLatent as RefDiT
    from dit.dit_decoder import DiT2 as RefDiT2
    from ldm.modules.diffusionmodules.model import (Decoder as RefDecoder,
                                                    MVEncoderGSDynamicInp)
    from nsr.triplane import OSGDecoder as RefOSGDecoder
    from vit.vit_triplane import PatchEmbedTriplane

    dit = RefDiT(input_size=arch.latent_size, patch_size=arch.patch_size,
                 in_channels=arch.ldm_z, hidden_size=arch.dit_hidden,
                 depth=arch.dit_depth, num_heads=arch.dit_heads,
                 num_classes=0, learn_sigma=False,
                 context_dim=arch.context_dim, roll_out=True,
                 vit_blk=TextCondDiTBlock).eval()
    enc = MVEncoderGSDynamicInp(
        ch=arch.enc_ch, out_ch=3, ch_mult=arch.enc_ch_mult,
        num_res_blocks=1, attn_resolutions=[], in_channels=10,
        resolution=32, z_channels=arch.ldm_z, double_z=True, num_frames=4,
        attn_kwargs={'n_heads': 2, 'd_head': 4}, dropout=0.0).eval()
    quant = torch.nn.Conv2d(2 * 3 * arch.ldm_z, 2 * 3 * arch.ldm_z, 1,
                            groups=3).eval()
    pe = PatchEmbedTriplane(img_size=arch.latent_size,
                            patch_size=arch.patch_size,
                            in_chans=3 * arch.ldm_z,
                            embed_dim=arch.dit2_hidden).eval()
    dit2 = RefDiT2(input_size=arch.latent_size, patch_size=arch.patch_size,
                   in_channels=arch.ldm_z, hidden_size=arch.dit2_hidden,
                   depth=arch.dit2_depth, num_heads=arch.dit2_heads,
                   num_classes=0, learn_sigma=False, mixed_prediction=False,
                   context_dim=None, roll_out=True, plane_n=3).eval()
    # the reference decoder class resizes the backbone pos_embed to
    # 3 planes (vit/vit_triplane.py:210-212)
    dit2.pos_embed = torch.nn.Parameter(torch.zeros(
        1, 3 * arch.tokens_per_plane, arch.dit2_hidden))
    dec = RefDecoder(ch=arch.conv_sr_ch, out_ch=arch.plane_channels,
                     ch_mult=arch.conv_sr_ch_mult,
                     num_res_blocks=arch.conv_sr_res_blocks,
                     attn_resolutions=[], in_channels=3,
                     resolution=arch.token_grid
                     * 2 ** (len(arch.conv_sr_ch_mult) - 1),
                     z_channels=arch.dit2_hidden).eval()
    osg = RefOSGDecoder(
        arch.plane_channels,
        {'decoder_lr_mul': 1.0,
         'decoder_output_dim': arch.decoder_output_dim}).eval()

    for i, m in enumerate((dit, enc, quant, pe, dit2, dec, osg)):
        _randomize(torch, m, 100 + i)

    sd = {}
    for prefix, m in [
            ('ddpm_model.', dit),
            ('rec_model.encoder.', enc),
            ('rec_model.decoder.superresolution.quant_conv.', quant),
            ('rec_model.decoder.superresolution.ldm_upsample.', pe),
            ('rec_model.decoder.vit_decoder.', dit2),
            ('rec_model.decoder.superresolution.conv_sr.', dec),
            ('rec_model.decoder.triplane_decoder.decoder.', osg)]:
        for k, v in m.state_dict().items():
            sd[prefix + k] = v
    torch.save(sd, path)
    return sd


class TestParityHarness:

    def test_end_to_end_on_synthetic_checkpoint(self, tmp_path):
        import parity_vs_reference as pvr

        path = str(tmp_path / 'model_joint_denoise_rec_model0.pt')
        write_synthetic_joint(path, pvr.SMALL)

        report = pvr.run_parity(path, pvr.SMALL, render_res=32,
                                n_views=1, samples=16)
        den = report['stages']['denoiser']
        dec = report['stages']['vae_decode']
        ren = report['stages']['render']
        # converted weights must reproduce the reference to f32 noise
        assert den['load_unexpected'] == 0
        assert den['rel_fro'] < 1e-4, den
        assert dec['rel_fro'] < 1e-4, dec
        assert ren['psnr_db'] > 60.0, ren
        assert np.isfinite(ren['lpips'])
        assert not ren['lpips_calibrated']   # no VGG weights offline

    def test_cli_gates_and_report(self, tmp_path, capsys):
        """The CLI path: gates evaluate, JSON report lands on disk."""
        import json

        import parity_vs_reference as pvr

        path = str(tmp_path / 'model_joint_denoise_rec_model1.pt')
        write_synthetic_joint(path, pvr.SMALL)
        out = str(tmp_path / 'report.json')
        pvr.main(['--ckpt', path, '--small', '--render_res', '32',
                  '--n_views', '1', '--samples', '16',
                  '--psnr_min', '40', '--out', out])
        rep = json.load(open(out))
        assert rep['pass'] is True
        assert set(rep['stages']) == {'denoiser', 'vae_decode', 'render'}

    def test_rejects_non_joint_checkpoint(self, tmp_path):
        import torch

        import parity_vs_reference as pvr
        path = str(tmp_path / 'not_joint.pt')
        torch.save({'foo.weight': torch.zeros(1)}, path)
        with pytest.raises(SystemExit, match='joint'):
            pvr.run_parity(path, pvr.SMALL)
