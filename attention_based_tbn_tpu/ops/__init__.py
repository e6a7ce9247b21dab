from .pooling import avg_pool2d, global_avg_pool, max_pool2d
from .spectrogram import (
    dft_basis,
    log_mel_spectrogram,
    log_power_stft,
    mel_filterbank,
    num_frames,
    spectrogram,
)

__all__ = [
    "avg_pool2d",
    "dft_basis",
    "global_avg_pool",
    "log_mel_spectrogram",
    "log_power_stft",
    "max_pool2d",
    "mel_filterbank",
    "num_frames",
    "spectrogram",
]
