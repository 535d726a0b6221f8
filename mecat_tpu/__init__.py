"""mecat_tpu: a TPU-native long-read overlap / error-correction / mapping framework.

Built from scratch in JAX / Pallas / pjit with the capabilities of
xiaochuanle/MECAT (mecat2pw, mecat2cns, mecat2ref, extract_sequences, and the
correct+trim pipeline).  See SURVEY.md for the blueprint and provenance notes.
"""

__version__ = "0.1.0"
