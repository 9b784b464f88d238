from mic_tpu.generate.search import GenerateOutput, generate  # noqa: F401
