"""Model registry.

The reference registers models in a plain dict (models/__init__.py:8,
`vae_models = {'VQVAE': VQVAE}`); the upstream zoo the README documents used
the same mechanism for 17 models. This registry carries the curve flagship
plus the classic image zoo rebuilt for TPU.
"""

from .base import BaseVAE  # noqa: F401
from .quantizer import (  # noqa: F401
    VQConfig,
    VQEpochStats,
    VQState,
    init_epoch_stats,
    init_state_from_centroids,
    init_vq_state,
    quantize_ema,
)
from .vq_vae import VQVAE  # noqa: F401

vae_models = {
    "VQVAE": VQVAE,
}


def register_model(name: str, cls) -> None:
    vae_models[name] = cls


def _register_zoo() -> None:
    """Image-zoo models are optional imports so the curve path stays light."""
    try:
        from .vanilla_vae import VanillaVAE
        from .beta_vae import BetaVAE
        from .wae_mmd import WAE_MMD
        from .iwae import IWAE
        from .miwae import MIWAE
        from .betatc_vae import BetaTCVAE
        from .mssim_vae import MSSIMVAE
        from .dip_vae import DIPVAE
        from .logcosh_vae import LogCoshVAE
        from .swae import SWAE
        from .conditional_vae import ConditionalVAE
        from .cat_vae import CategoricalVAE
        from .joint_vae import JointVAE
        from .info_vae import InfoVAE
        from .dfc_vae import DFCVAE
    except ImportError:  # pragma: no cover - zoo not built yet
        return
    vae_models.update({
        "VanillaVAE": VanillaVAE,
        "BetaVAE": BetaVAE,
        "WAE_MMD": WAE_MMD,
        "IWAE": IWAE,
        "MIWAE": MIWAE,
        "BetaTCVAE": BetaTCVAE,
        "MSSIMVAE": MSSIMVAE,
        "DIPVAE": DIPVAE,
        "LogCoshVAE": LogCoshVAE,
        "SWAE": SWAE,
        "ConditionalVAE": ConditionalVAE,
        "CategoricalVAE": CategoricalVAE,
        "JointVAE": JointVAE,
        "InfoVAE": InfoVAE,
        "DFCVAE": DFCVAE,
    })


_register_zoo()
