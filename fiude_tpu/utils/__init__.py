from fiude_tpu.utils.history import History
