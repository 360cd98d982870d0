"""Hosted-API predictor surface tests (validation layer; the heavy pipeline
path is covered by test_full_cover)."""

import pytest

from aicovergen_tpu.api.predict import PITCH_CHOICES, Predictor


def test_pitch_enum_mapping():
    assert PITCH_CHOICES == {"no-change": 0, "male-to-female": 1, "female-to-male": -1}


@pytest.mark.parametrize(
    "kwargs,match",
    [
        ({"pitch_change": "up"}, "pitch_change"),
        ({"pitch_detection_algorithm": "magic"}, "pitch detection"),
        ({"output_format": "flac"}, "output_format"),
        ({"index_rate": 1.5}, "index_rate"),
        ({"filter_radius": 9}, "filter_radius"),
        ({"protect": 0.9}, "protect"),
    ],
)
def test_input_validation(tmp_path, kwargs, match):
    p = Predictor(base_dir=str(tmp_path))
    p.setup()
    base = dict(song_input="x.wav", rvc_model="V")
    base.update(kwargs)
    with pytest.raises(ValueError, match=match):
        p.predict(**base)
