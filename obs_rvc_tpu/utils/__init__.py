from obs_rvc_tpu.utils.audio import downmix_to_mono, upmix_from_mono, read_wav, write_wav

__all__ = ["downmix_to_mono", "upmix_from_mono", "read_wav", "write_wav"]
