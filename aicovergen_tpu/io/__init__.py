from .audio import read_wav, write_wav, load_audio, save_audio, to_stereo, to_mono  # noqa: F401
