from .stft import stft, istft, hann_window  # noqa: F401
from .mel import mel_filterbank, log_mel_spectrogram  # noqa: F401
from .filters import (  # noqa: F401
    butter_highpass,
    lfilter,
    filtfilt,
    medfilt,
)
from .resample import resample, resample_poly_np  # noqa: F401
from .envelope import frame_rms, mix_rms_envelope, linear_interp_1d  # noqa: F401
