from fiude_tpu.data.loader import ArrayLoader, convert_to_arrays
