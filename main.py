"""CLI-parity alias for the reference's training entry point
(/root/reference/main.py:451-729): `python main.py --base <cfg.yaml>
--pretrained_model <ckpt> ...` — delegates to train.py (the TPU-native
driver)."""
from train import main

if __name__ == "__main__":
    main()
