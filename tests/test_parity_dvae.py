"""Golden parity: JAX DVAE vs reference DiscreteVAE (tiny, 1-D)."""

import sys

import numpy as np
import torch

sys.path.insert(0, "tests")
import reference_shim

reference_shim.install()

import jax.numpy as jnp

from indextts_tpu.models.codec.dvae import (dvae_codebook_indices, dvae_decode,
                                            init_dvae)
from indextts_tpu.utils import convert

torch.manual_seed(0)


def _ref_dvae():
    from indextts.vqvae.xtts_dvae import DiscreteVAE

    return DiscreteVAE(positional_dims=1, num_tokens=32, codebook_dim=16,
                       num_layers=2, num_resnet_blocks=3, hidden_dim=16,
                       channels=8, stride=2, kernel_size=4,
                       use_transposed_convs=True, activation="relu").eval()


def test_dvae_parity(rng):
    ref = _ref_dvae()
    sd = {k: v.detach().float().numpy() for k, v in ref.state_dict().items()}
    params = convert.convert_dvae(sd, num_layers=2, num_resnet_blocks=3)

    mel = rng.standard_normal((1, 8, 24)).astype(np.float32)  # (B, C, T)
    with torch.no_grad():
        codes_ref = ref.get_codebook_indices(torch.tensor(mel)).numpy()
        recon_ref, _ = ref.decode(torch.tensor(codes_ref))
    codes = np.asarray(dvae_codebook_indices(params,
                                             jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_array_equal(codes, codes_ref)
    recon = np.asarray(dvae_decode(params, jnp.asarray(codes)))
    np.testing.assert_allclose(recon.transpose(0, 2, 1), recon_ref.numpy(),
                               atol=2e-4, rtol=1e-3)
