"""Entry-point alias: `python -m openvision_tpu.main_clip` ≙ the trainer CLI.

Mirrors the reference's `python -m src.main_clip` invocation surface
(reference src/main_clip.py:783); all logic lives in train/trainer.py.
"""

from openvision_tpu.train.trainer import main

if __name__ == "__main__":
    main()
