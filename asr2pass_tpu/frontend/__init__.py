from asr2pass_tpu.frontend.fbank import FbankExtractor, num_frames
from asr2pass_tpu.frontend.lfr import apply_lfr, apply_cmvn, lfr_len
from asr2pass_tpu.frontend.audio import (
    load_wav_bytes,
    load_pcm_bytes,
    load_audio_file,
    linear_resample,
    parse_kaldi_cmvn,
)
