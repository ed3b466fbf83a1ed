"""Colored-dSprites stage-1 pretrainer CLI
(parity: ``python colored_dSprites/pxy_color.py``)."""

from eadgan_tpu.cli.pxy import main as _main


def main(argv=None) -> None:
    _main(argv, colored=True)


if __name__ == "__main__":
    main()
