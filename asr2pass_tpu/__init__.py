"""asr2pass_tpu — a TPU-native 2-pass streaming/offline ASR framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
FunASR-runtime C++/ONNX service (duj12/ASR-2Pass): fbank front-end, FSMN-VAD,
streaming Paraformer (pass 1), offline Paraformer / SenseVoice (pass 2),
CT-Transformer punctuation, ITN, hotword biasing, timestamps, and a
protocol-compatible websocket server.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  frontend/   audio load/resample + fbank/LFR/CMVN (MXU matmul-DFT + Pallas)
  models/     JAX model definitions (SAN-M encoder/decoder, CIF, VAD NN,
              CT-Transformer, SenseVoice) as functional param-pytree modules
  ops/        Pallas TPU kernels for the hot ops
  vad/        E2E VAD decision state machine (host)
  text/       vocab/detokenizers, punc tokenizer, ITN, timestamps
  decode/     greedy / CTC prefix beam / WFST-LM / hotword bias search
  runtime/    stream composition, 2pass splitter, batched stream engine
  server/     asyncio websocket server speaking the reference JSON protocol
  parallel/   device mesh + sharding rules (TP for pass-2, DP over streams)
  train/      fine-tune step (CE on sampled decoder) — absent in reference
  native/     C++ host-native pieces (FST suite) + ctypes bindings
  tools/      WER scoring, bulk transcription, pipelines
"""

__version__ = "0.1.0"
