"""Colored-dSprites EAD-GAN trainer CLI
(parity: ``python colored_dSprites/rp_color.py``)."""

from eadgan_tpu.cli.rp import main as _main


def main(argv=None) -> None:
    _main(argv, colored=True)


if __name__ == "__main__":
    main()
