"""TR (textual-restoration) mapper training CLI (pipeline A, stage 2).

Command surface mirrors scripts/train/main_train_tr_mapping.py (README
:74-96): frozen towers + frozen pretrained I2T mapper, trainable CleanMapper
stacked after it, CLIP view = degraded image, SD target = clean image.
The reference ships an optimizer-wiring bug that trains the frozen I2T
mapper instead (SURVEY.md §2.5.3); here the CleanMapper trains, as intended
(verified by tests/test_pipeline_a.py::TestEndToEnd).
"""

from textualdegremoval_tpu.cli.train_i2t import run


def main(argv=None):
    return run("tr", argv)


if __name__ == "__main__":
    main()
