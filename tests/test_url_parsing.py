"""Offline tests for YouTube URL → video-id parsing (reference main.py:31-60).

Pure-function matrix: every URL shape the reference's parser handles, plus
the non-YouTube / garbage cases that must return None.
"""

import pytest

from aicovergen_tpu.pipeline.cover import get_youtube_video_id

VID = "dQw4w9WgXcQ"


@pytest.mark.parametrize(
    "url",
    [
        f"https://www.youtube.com/watch?v={VID}",
        f"http://www.youtube.com/watch?v={VID}",
        f"https://youtube.com/watch?v={VID}",
        f"https://music.youtube.com/watch?v={VID}",
        f"https://www.youtube.com/watch?v={VID}&t=42s",
        f"https://www.youtube.com/watch?feature=share&v={VID}",
        f"https://youtu.be/{VID}",
        f"https://www.youtube.com/embed/{VID}",
        f"https://www.youtube.com/v/{VID}",
    ],
)
def test_video_id_extracted(url):
    assert get_youtube_video_id(url) == VID


def test_youtu_be_watch_form():
    # youtu.be/watch?v=ID: the parser takes query[2:] (everything after "v=")
    assert get_youtube_video_id(f"https://youtu.be/watch?v={VID}") == VID


def test_playlist_id_when_not_ignored():
    url = f"https://www.youtube.com/watch?v={VID}&list=PL123abc"
    assert get_youtube_video_id(url, ignore_playlist=False) == "PL123abc"
    assert get_youtube_video_id(url, ignore_playlist=True) == VID


def test_playlist_flag_without_list_falls_through():
    url = f"https://www.youtube.com/watch?v={VID}"
    assert get_youtube_video_id(url, ignore_playlist=False) == VID


@pytest.mark.parametrize(
    "url",
    [
        "https://vimeo.com/12345",
        "https://example.com/watch?v=abc",
        "not a url at all",
        "/local/path/song.wav",
        "https://www.youtube.com/feed/subscriptions",
    ],
)
def test_non_video_inputs_return_none(url):
    assert get_youtube_video_id(url) is None
