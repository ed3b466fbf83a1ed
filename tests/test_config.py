"""Config validation: inconsistent colored/code_dim/channels must fail
loudly at construction, not as opaque trace-time broadcast errors."""

import pytest

from eadgan_tpu.train.config import PxyConfig, SpritesGanConfig


def test_pxy_config_colored_requires_six_codes():
    with pytest.raises(ValueError, match="code_dim must be 6"):
        PxyConfig(colored=True)
    PxyConfig(colored=True, code_dim=6)  # ok
    with pytest.raises(ValueError, match="code_dim must be 3"):
        PxyConfig(code_dim=6)


def test_sprites_config_couples_colored_fields():
    with pytest.raises(ValueError, match="code_dim must be 7"):
        SpritesGanConfig(colored=True, channels=3)
    with pytest.raises(ValueError, match="channels must be 3"):
        SpritesGanConfig(colored=True, code_dim=7)
    SpritesGanConfig(colored=True, code_dim=7, channels=3)  # ok
