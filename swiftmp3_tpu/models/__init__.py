"""The flagship 'model': the MP3 frame-encode pipeline as a jittable scan.

swiftmp3_tpu has no neural nets; its model is the deterministic DSP program
that maps PCM frames + carried codec state to quantized spectra and side-info
integers. `pipeline.py` assembles the ops layer into that program.
"""
