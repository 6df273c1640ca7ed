from .gan import bce_logits, discriminator_loss, generator_adv_loss
from .perceptual import (
    VGG_FEATURE_LAYERS,
    load_vgg19_params,
    perceptual_loss,
    synthesize_vgg19_params,
    vgg19_features,
)
from .vae import kl_raw_sigma, seq_recon_loss

__all__ = [
    "VGG_FEATURE_LAYERS",
    "bce_logits",
    "discriminator_loss",
    "generator_adv_loss",
    "kl_raw_sigma",
    "load_vgg19_params",
    "perceptual_loss",
    "seq_recon_loss",
    "synthesize_vgg19_params",
    "vgg19_features",
]
