# Ruby binding for the whisper_tpu engine.
#
# Mirrors the reference binding's API shape (whisper.cpp bindings/ruby:
# Whisper::Context / Whisper::Params / per-segment access) over the C ABI
# exported by libwhisper_tpu.so (native/whisper_tpu.h), using only the Ruby
# standard library (fiddle) — no C extension to compile.  Params travel via
# the *_json convenience entry points (whisper_tpu.h:44-61), which exist
# precisely for FFIs that cannot pass a 56-field C struct by value; the five
# C function-pointer callbacks remain available to compiled consumers via
# whisper_full's struct entry (see bindings/cpp and the CI-run C hosts).
#
# Usage:
#   ENV["WHISPER_TPU_LIB"] ||= "/path/to/libwhisper_tpu.so"
#   require "whisper_tpu"
#   ctx = WhisperTpu::Context.new("ggml-base.en.bin")
#   ctx.transcribe(samples, language: "en", beam_size: 5) do |seg|
#     puts "[#{seg.t0}.#{seg.t1}] #{seg.text}"
#   end
#   ctx.close
#
# STATUS: source-complete but UNTESTED in this repository's CI — no Ruby
# interpreter exists on the build host (tests/test_bindings.py skips, same
# policy as the Go binding).  The call surface it uses is exactly the one
# exercised end-to-end by the CI-run pure-C hosts (tests/test_c_abi.py).

require "fiddle"
require "json"

module WhisperTpu
  Segment = Struct.new(:t0, :t1, :text, keyword_init: true) do
    # t0/t1 are 10 ms ticks (reference whisper_segment semantics)
    def t0_s = t0 / 100.0
    def t1_s = t1 / 100.0
  end

  TokenData = Struct.new(:id, :p, :t0, :t1, keyword_init: true)

  class Error < StandardError; end

  module Lib
    PATH = ENV["WHISPER_TPU_LIB"] || "libwhisper_tpu.so"

    def self.handle
      @handle ||= Fiddle.dlopen(PATH)
    end

    FUNCS = {
      whisper_init_from_file: [[Fiddle::TYPE_VOIDP], Fiddle::TYPE_VOIDP],
      whisper_free: [[Fiddle::TYPE_VOIDP], Fiddle::TYPE_VOID],
      whisper_full_json: [
        [Fiddle::TYPE_VOIDP, Fiddle::TYPE_VOIDP, Fiddle::TYPE_VOIDP,
         Fiddle::TYPE_INT], Fiddle::TYPE_INT],
      whisper_full_parallel_json: [
        [Fiddle::TYPE_VOIDP, Fiddle::TYPE_VOIDP, Fiddle::TYPE_VOIDP,
         Fiddle::TYPE_INT, Fiddle::TYPE_INT], Fiddle::TYPE_INT],
      whisper_full_n_segments: [[Fiddle::TYPE_VOIDP], Fiddle::TYPE_INT],
      whisper_full_get_segment_t0: [
        [Fiddle::TYPE_VOIDP, Fiddle::TYPE_INT], Fiddle::TYPE_LONG_LONG],
      whisper_full_get_segment_t1: [
        [Fiddle::TYPE_VOIDP, Fiddle::TYPE_INT], Fiddle::TYPE_LONG_LONG],
      whisper_full_get_segment_text: [
        [Fiddle::TYPE_VOIDP, Fiddle::TYPE_INT], Fiddle::TYPE_VOIDP],
      whisper_full_n_tokens: [
        [Fiddle::TYPE_VOIDP, Fiddle::TYPE_INT], Fiddle::TYPE_INT],
      whisper_full_get_token_id: [
        [Fiddle::TYPE_VOIDP, Fiddle::TYPE_INT, Fiddle::TYPE_INT],
        Fiddle::TYPE_INT],
      whisper_full_get_token_p: [
        [Fiddle::TYPE_VOIDP, Fiddle::TYPE_INT, Fiddle::TYPE_INT],
        Fiddle::TYPE_FLOAT],
      whisper_token_to_str: [
        [Fiddle::TYPE_VOIDP, Fiddle::TYPE_INT], Fiddle::TYPE_VOIDP],
      whisper_lang_str: [[Fiddle::TYPE_INT], Fiddle::TYPE_VOIDP],
      whisper_full_lang_id: [[Fiddle::TYPE_VOIDP], Fiddle::TYPE_INT],
      whisper_is_multilingual: [[Fiddle::TYPE_VOIDP], Fiddle::TYPE_INT],
      whisper_print_system_info: [[], Fiddle::TYPE_VOIDP],
    }.freeze

    def self.[](name)
      @funcs ||= {}
      @funcs[name] ||= begin
        args, ret = FUNCS.fetch(name)
        Fiddle::Function.new(handle[name.to_s], args, ret)
      end
    end
  end

  class Context
    def initialize(model_path)
      @ctx = Lib[:whisper_init_from_file].call(model_path.to_s)
      raise Error, "unable to load model #{model_path}" if @ctx.null?
    end

    # samples: Array<Float> or packed "e*" String of f32 PCM at 16 kHz.
    # params: keyword args serialized to the JSON params surface
    # (native/whisper_tpu.h whisper_full_json; field names match
    # whisper_full_params).  Yields each Segment when a block is given.
    def transcribe(samples, n_processors: 1, **params)
      raise Error, "context closed" unless @ctx
      pcm = samples.is_a?(String) ? samples : samples.pack("e*")
      n = pcm.bytesize / 4
      buf = Fiddle::Pointer[pcm]
      pj = JSON.generate(params)
      rc = if n_processors > 1
             Lib[:whisper_full_parallel_json].call(@ctx, pj, buf, n,
                                                   n_processors)
           else
             Lib[:whisper_full_json].call(@ctx, pj, buf, n)
           end
      raise Error, "whisper_full failed (rc=#{rc})" unless rc.zero?
      segments.each { |s| yield s } if block_given?
      segments
    end

    def segments
      (0...Lib[:whisper_full_n_segments].call(@ctx)).map do |i|
        Segment.new(
          t0: Lib[:whisper_full_get_segment_t0].call(@ctx, i),
          t1: Lib[:whisper_full_get_segment_t1].call(@ctx, i),
          text: Lib[:whisper_full_get_segment_text].call(@ctx, i).to_s)
      end
    end

    def tokens(segment_index)
      (0...Lib[:whisper_full_n_tokens].call(@ctx, segment_index)).map do |j|
        id = Lib[:whisper_full_get_token_id].call(@ctx, segment_index, j)
        TokenData.new(
          id: id, p: Lib[:whisper_full_get_token_p].call(@ctx,
                                                         segment_index, j))
      end
    end

    def full_text = segments.map(&:text).join

    def detected_language
      Lib[:whisper_lang_str].call(Lib[:whisper_full_lang_id].call(@ctx)).to_s
    end

    def multilingual? = !Lib[:whisper_is_multilingual].call(@ctx).zero?

    def close
      Lib[:whisper_free].call(@ctx) if @ctx
      @ctx = nil
    end
  end

  def self.system_info = Lib[:whisper_print_system_info].call.to_s

  # Minimal 16-bit mono/stereo WAV reader (reference examples read WAV via
  # miniaudio; this covers the common case without native deps).
  def self.read_wav(path)
    data = File.binread(path)
    raise Error, "not RIFF/WAVE" unless data[0, 4] == "RIFF" &&
                                        data[8, 4] == "WAVE"
    pos = 12
    fmt = nil
    while pos + 8 <= data.bytesize
      cid, csz = data[pos, 4], data[pos + 4, 4].unpack1("V")
      body = data[pos + 8, csz]
      fmt = body.unpack("vvVVvv") if cid == "fmt "
      if cid == "data"
        raise Error, "no fmt chunk" unless fmt
        _af, ch, _rate, _bps, _ba, bits = fmt
        raise Error, "only 16-bit PCM supported" unless bits == 16
        ints = body.unpack("s<*")
        mono = if ch == 1 then ints
               else ints.each_slice(ch).map { |fr| fr.sum / ch }
               end
        return mono.map { |v| v / 32768.0 }
      end
      pos += 8 + csz + (csz & 1)
    end
    raise Error, "no data chunk"
  end
end
