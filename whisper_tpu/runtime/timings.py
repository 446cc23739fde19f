"""Phase timers — mirror of whisper_timings / whisper_print_timings
(include/whisper.h:438-447, src/whisper.cpp:4282-4304)."""

from __future__ import annotations

import sys
from dataclasses import dataclass, field


@dataclass
class Timings:
    t_start_us: int = 0
    t_mel_us: int = 0
    t_sample_us: int = 0
    t_encode_us: int = 0
    t_decode_us: int = 0
    t_batchd_us: int = 0
    t_prompt_us: int = 0

    n_sample: int = 0
    n_encode: int = 0
    n_decode: int = 0
    n_batchd: int = 0
    n_prompt: int = 0
    n_fail_p: int = 0
    n_fail_h: int = 0

    def reset(self) -> None:
        for f in self.__dataclass_fields__:
            setattr(self, f, 0)

    def print(self, file=sys.stderr, t_total_us: int = 0) -> None:
        def per(t, n):
            return t / 1000.0 / max(1, n)

        p = lambda *a: print(*a, file=file)
        p(f"whisper_print_timings:     mel time = {self.t_mel_us/1000.0:8.2f} ms")
        p(f"whisper_print_timings:  sample time = {self.t_sample_us/1000.0:8.2f} ms / "
          f"{max(1,self.n_sample):5d} runs ({per(self.t_sample_us,self.n_sample):8.2f} ms per run)")
        p(f"whisper_print_timings:  encode time = {self.t_encode_us/1000.0:8.2f} ms / "
          f"{max(1,self.n_encode):5d} runs ({per(self.t_encode_us,self.n_encode):8.2f} ms per run)")
        p(f"whisper_print_timings:  decode time = {self.t_decode_us/1000.0:8.2f} ms / "
          f"{max(1,self.n_decode):5d} runs ({per(self.t_decode_us,self.n_decode):8.2f} ms per run)")
        p(f"whisper_print_timings:  batchd time = {self.t_batchd_us/1000.0:8.2f} ms / "
          f"{max(1,self.n_batchd):5d} runs ({per(self.t_batchd_us,self.n_batchd):8.2f} ms per run)")
        p(f"whisper_print_timings:  prompt time = {self.t_prompt_us/1000.0:8.2f} ms / "
          f"{max(1,self.n_prompt):5d} runs ({per(self.t_prompt_us,self.n_prompt):8.2f} ms per run)")
        if t_total_us:
            p(f"whisper_print_timings:   total time = {t_total_us/1000.0:8.2f} ms")
