from asr2pass_tpu.vad.e2e_vad import E2EVadStateMachine, VadOptions
