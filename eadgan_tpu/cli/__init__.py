"""Command-line entry points mirroring the nine reference commands:

=============================================  =====================================
reference                                      this package
=============================================  =====================================
python MNIST/approximate_rpqmnxy.py            python -m eadgan_tpu.cli.approximate_rpqmnxy
python MNIST/EAD-GAN_rpqmnxy.py                python -m eadgan_tpu.cli.mnist
python MNIST/generate_image.py                 python -m eadgan_tpu.cli.generate_image
python dSprites/pxy.py                         python -m eadgan_tpu.cli.pxy
python dSprites/rp.py                          python -m eadgan_tpu.cli.rp
python colored_dSprites/pxy_color.py           python -m eadgan_tpu.cli.pxy_color
python colored_dSprites/rp_color.py            python -m eadgan_tpu.cli.rp_color
python celebA/EAD-GAN_celebA.py                python -m eadgan_tpu.cli.celeba
python celebA/gen_imgs.py                      python -m eadgan_tpu.cli.gen_imgs
=============================================  =====================================

Flag names and defaults match the reference argparse blocks; additional
flags (``--data_dir``, ``--out_dir``, ``--resume``, ``--max_steps``,
``--jsonl``) extend them without breaking parity.
"""
