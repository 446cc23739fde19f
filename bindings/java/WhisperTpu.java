/**
 * Java binding for the whisper_tpu engine.
 *
 * Mirrors the reference Java binding's surface (whisper.cpp bindings/java:
 * io.github.ggerganov.whispercpp.WhisperCpp — init/fullTranscribe/segment
 * accessors) over the C ABI exported by libwhisper_tpu.so
 * (native/whisper_tpu.h), using the java.lang.foreign FFM API (JDK 22+)
 * instead of JNA — no native glue to compile.  Two parameter surfaces:
 *
 *  - fullTranscribe(samples, paramsJson): the *_json convenience entry
 *    points (whisper_tpu.h:44-61) — any whisper_full_params field by name.
 *  - fullTranscribeStreaming(samples, params, listener): the REAL
 *    whisper_full(struct by value) entry point with an FFM upcall stub
 *    installed as new_segment_callback, streaming segments to the
 *    listener mid-run exactly like the reference Go binding's C
 *    trampolines (whisper.cpp bindings/go/whisper.go:20-44).  The struct
 *    starts from whisper_full_default_params_by_ref and is patched
 *    through a hand-declared FFM layout whose offsets were verified
 *    against gcc offsetof on x86-64 SysV; the layout's byteSize is
 *    asserted against whisper_full_params_sizeof() at class load, so an
 *    ABI drift fails fast instead of corrupting fields.
 *
 * Usage:
 *   java -Djava.library.path=/path/to/lib --enable-native-access=ALL-UNNAMED \
 *        WhisperTpuExample model.bin audio.pcm
 *
 * STATUS: source-complete but UNTESTED in this repository's CI — no Java
 * runtime exists on the build host (tests/test_bindings.py skips, same
 * policy as the Go binding).  The call surface it uses is exactly the one
 * exercised end-to-end by the CI-run pure-C hosts (tests/test_c_abi.py).
 */

import java.lang.foreign.Arena;
import java.lang.foreign.FunctionDescriptor;
import java.lang.foreign.Linker;
import java.lang.foreign.MemoryLayout;
import java.lang.foreign.MemorySegment;
import java.lang.foreign.SymbolLookup;
import java.lang.foreign.ValueLayout;
import java.lang.invoke.MethodHandle;
import java.lang.invoke.MethodHandles;
import java.lang.invoke.MethodType;
import java.util.ArrayList;
import java.util.List;

public final class WhisperTpu implements AutoCloseable {

    /** One decoded segment; t0/t1 are 10 ms ticks (whisper_segment). */
    public record Segment(long t0, long t1, String text) {}

    private static final Linker LINKER = Linker.nativeLinker();
    private static final SymbolLookup LIB = SymbolLookup.libraryLookup(
            System.getProperty("whisper_tpu.lib", "libwhisper_tpu.so"),
            Arena.global());

    private static MethodHandle dl(String name, FunctionDescriptor desc) {
        return LINKER.downcallHandle(LIB.find(name).orElseThrow(
                () -> new UnsatisfiedLinkError(name)), desc);
    }

    private static final MethodHandle INIT = dl("whisper_init_from_file",
            FunctionDescriptor.of(ValueLayout.ADDRESS, ValueLayout.ADDRESS));
    private static final MethodHandle FREE = dl("whisper_free",
            FunctionDescriptor.ofVoid(ValueLayout.ADDRESS));
    private static final MethodHandle FULL_JSON = dl("whisper_full_json",
            FunctionDescriptor.of(ValueLayout.JAVA_INT, ValueLayout.ADDRESS,
                    ValueLayout.ADDRESS, ValueLayout.ADDRESS,
                    ValueLayout.JAVA_INT));
    private static final MethodHandle N_SEGMENTS = dl(
            "whisper_full_n_segments",
            FunctionDescriptor.of(ValueLayout.JAVA_INT, ValueLayout.ADDRESS));
    private static final MethodHandle SEG_T0 = dl(
            "whisper_full_get_segment_t0",
            FunctionDescriptor.of(ValueLayout.JAVA_LONG, ValueLayout.ADDRESS,
                    ValueLayout.JAVA_INT));
    private static final MethodHandle SEG_T1 = dl(
            "whisper_full_get_segment_t1",
            FunctionDescriptor.of(ValueLayout.JAVA_LONG, ValueLayout.ADDRESS,
                    ValueLayout.JAVA_INT));
    private static final MethodHandle SEG_TEXT = dl(
            "whisper_full_get_segment_text",
            FunctionDescriptor.of(ValueLayout.ADDRESS, ValueLayout.ADDRESS,
                    ValueLayout.JAVA_INT));
    private static final MethodHandle LANG_ID = dl("whisper_full_lang_id",
            FunctionDescriptor.of(ValueLayout.JAVA_INT, ValueLayout.ADDRESS));
    private static final MethodHandle LANG_STR = dl("whisper_lang_str",
            FunctionDescriptor.of(ValueLayout.ADDRESS, ValueLayout.JAVA_INT));

    /* ---- whisper_full_params struct path (by value + upcall stubs) ---- */

    /** FFM layout of struct whisper_full_params (whisper_tpu.h:424-507).
     *  Offsets verified against gcc offsetof on x86-64 SysV (strategy 0,
     *  thold_pt 32, suppress_regex 64, language 104, temperature 116,
     *  greedy.best_of 144, new_segment_callback 160, grammar_rules 240,
     *  vad_params 280, sizeof 304) and asserted against the library's
     *  whisper_full_params_sizeof() at class load below. */
    private static final MemoryLayout PARAMS_LAYOUT =
        MemoryLayout.structLayout(
            ValueLayout.JAVA_INT.withName("strategy"),
            ValueLayout.JAVA_INT.withName("n_threads"),
            ValueLayout.JAVA_INT.withName("n_max_text_ctx"),
            ValueLayout.JAVA_INT.withName("offset_ms"),
            ValueLayout.JAVA_INT.withName("duration_ms"),
            ValueLayout.JAVA_BOOLEAN.withName("translate"),
            ValueLayout.JAVA_BOOLEAN.withName("no_context"),
            ValueLayout.JAVA_BOOLEAN.withName("no_timestamps"),
            ValueLayout.JAVA_BOOLEAN.withName("single_segment"),
            ValueLayout.JAVA_BOOLEAN.withName("print_special"),
            ValueLayout.JAVA_BOOLEAN.withName("print_progress"),
            ValueLayout.JAVA_BOOLEAN.withName("print_realtime"),
            ValueLayout.JAVA_BOOLEAN.withName("print_timestamps"),
            ValueLayout.JAVA_BOOLEAN.withName("token_timestamps"),
            MemoryLayout.paddingLayout(3),
            ValueLayout.JAVA_FLOAT.withName("thold_pt"),
            ValueLayout.JAVA_FLOAT.withName("thold_ptsum"),
            ValueLayout.JAVA_INT.withName("max_len"),
            ValueLayout.JAVA_BOOLEAN.withName("split_on_word"),
            MemoryLayout.paddingLayout(3),
            ValueLayout.JAVA_INT.withName("max_tokens"),
            ValueLayout.JAVA_BOOLEAN.withName("debug_mode"),
            MemoryLayout.paddingLayout(3),
            ValueLayout.JAVA_INT.withName("audio_ctx"),
            ValueLayout.JAVA_BOOLEAN.withName("tdrz_enable"),
            MemoryLayout.paddingLayout(3),
            ValueLayout.ADDRESS.withName("suppress_regex"),
            ValueLayout.ADDRESS.withName("initial_prompt"),
            ValueLayout.JAVA_BOOLEAN.withName("carry_initial_prompt"),
            MemoryLayout.paddingLayout(7),
            ValueLayout.ADDRESS.withName("prompt_tokens"),
            ValueLayout.JAVA_INT.withName("prompt_n_tokens"),
            MemoryLayout.paddingLayout(4),
            ValueLayout.ADDRESS.withName("language"),
            ValueLayout.JAVA_BOOLEAN.withName("detect_language"),
            ValueLayout.JAVA_BOOLEAN.withName("suppress_blank"),
            ValueLayout.JAVA_BOOLEAN.withName("suppress_nst"),
            MemoryLayout.paddingLayout(1),
            ValueLayout.JAVA_FLOAT.withName("temperature"),
            ValueLayout.JAVA_FLOAT.withName("max_initial_ts"),
            ValueLayout.JAVA_FLOAT.withName("length_penalty"),
            ValueLayout.JAVA_FLOAT.withName("temperature_inc"),
            ValueLayout.JAVA_FLOAT.withName("entropy_thold"),
            ValueLayout.JAVA_FLOAT.withName("logprob_thold"),
            ValueLayout.JAVA_FLOAT.withName("no_speech_thold"),
            ValueLayout.JAVA_INT.withName("greedy_best_of"),
            ValueLayout.JAVA_INT.withName("beam_size"),
            ValueLayout.JAVA_FLOAT.withName("beam_patience"),
            MemoryLayout.paddingLayout(4),
            ValueLayout.ADDRESS.withName("new_segment_callback"),
            ValueLayout.ADDRESS.withName("new_segment_callback_user_data"),
            ValueLayout.ADDRESS.withName("progress_callback"),
            ValueLayout.ADDRESS.withName("progress_callback_user_data"),
            ValueLayout.ADDRESS.withName("encoder_begin_callback"),
            ValueLayout.ADDRESS.withName("encoder_begin_callback_user_data"),
            ValueLayout.ADDRESS.withName("abort_callback"),
            ValueLayout.ADDRESS.withName("abort_callback_user_data"),
            ValueLayout.ADDRESS.withName("logits_filter_callback"),
            ValueLayout.ADDRESS.withName("logits_filter_callback_user_data"),
            ValueLayout.ADDRESS.withName("grammar_rules"),
            ValueLayout.JAVA_LONG.withName("n_grammar_rules"),
            ValueLayout.JAVA_LONG.withName("i_start_rule"),
            ValueLayout.JAVA_FLOAT.withName("grammar_penalty"),
            ValueLayout.JAVA_BOOLEAN.withName("vad"),
            MemoryLayout.paddingLayout(3),
            ValueLayout.ADDRESS.withName("vad_model_path"),
            ValueLayout.JAVA_FLOAT.withName("vad_threshold"),
            ValueLayout.JAVA_INT.withName("vad_min_speech_duration_ms"),
            ValueLayout.JAVA_INT.withName("vad_min_silence_duration_ms"),
            ValueLayout.JAVA_FLOAT.withName("vad_max_speech_duration_s"),
            ValueLayout.JAVA_INT.withName("vad_speech_pad_ms"),
            ValueLayout.JAVA_FLOAT.withName("vad_samples_overlap")
        ).withName("whisper_full_params");

    private static long off(String name) {
        return PARAMS_LAYOUT.byteOffset(
                MemoryLayout.PathElement.groupElement(name));
    }

    private static final MethodHandle DEFAULT_PARAMS_BY_REF = dl(
            "whisper_full_default_params_by_ref",
            FunctionDescriptor.of(ValueLayout.ADDRESS, ValueLayout.JAVA_INT));
    private static final MethodHandle PARAMS_SIZEOF = dl(
            "whisper_full_params_sizeof",
            FunctionDescriptor.of(ValueLayout.JAVA_LONG));
    private static final MethodHandle FULL_STRUCT = dl("whisper_full",
            FunctionDescriptor.of(ValueLayout.JAVA_INT, ValueLayout.ADDRESS,
                    PARAMS_LAYOUT, ValueLayout.ADDRESS,
                    ValueLayout.JAVA_INT));

    static {
        try {
            long nativeSize = (long) PARAMS_SIZEOF.invoke();
            if (nativeSize != PARAMS_LAYOUT.byteSize()) {
                throw new IllegalStateException(
                        "whisper_full_params ABI drift: library sizeof="
                        + nativeSize + " vs declared layout="
                        + PARAMS_LAYOUT.byteSize());
            }
        } catch (RuntimeException | Error e) {
            throw e;
        } catch (Throwable t) {
            throw new ExceptionInInitializerError(t);
        }
    }

    /** Segment listener for mid-run streaming (new_segment_callback). */
    @FunctionalInterface
    public interface SegmentListener {
        void onSegment(Segment segment);
    }

    /** Typed view over a default-initialized whisper_full_params struct;
     *  unset fields keep whisper_full_default_params' values. */
    public static final class Params {
        final MemorySegment seg;
        private final Arena arena;

        /** strategy: 0 = greedy, 1 = beam search (whisper.h). */
        public Params(Arena arena, int strategy) {
            this.arena = arena;
            try {
                MemorySegment def = ((MemorySegment)
                        DEFAULT_PARAMS_BY_REF.invoke(strategy))
                        .reinterpret(PARAMS_LAYOUT.byteSize());
                seg = arena.allocate(PARAMS_LAYOUT);
                seg.copyFrom(def);       // leaked malloc'd default is tiny;
            } catch (Throwable t) {      // freed by process teardown
                throw new RuntimeException(t);
            }
        }

        private void str(String field, String v) {
            seg.set(ValueLayout.ADDRESS, off(field),
                    v == null ? MemorySegment.NULL : arena.allocateFrom(v));
        }

        public Params language(String v) { str("language", v); return this; }
        public Params initialPrompt(String v) {
            str("initial_prompt", v); return this;
        }
        public Params suppressRegex(String v) {
            str("suppress_regex", v); return this;
        }
        public Params translate(boolean v) {
            seg.set(ValueLayout.JAVA_BOOLEAN, off("translate"), v);
            return this;
        }
        public Params noTimestamps(boolean v) {
            seg.set(ValueLayout.JAVA_BOOLEAN, off("no_timestamps"), v);
            return this;
        }
        public Params tokenTimestamps(boolean v) {
            seg.set(ValueLayout.JAVA_BOOLEAN, off("token_timestamps"), v);
            return this;
        }
        public Params maxLen(int v) {
            seg.set(ValueLayout.JAVA_INT, off("max_len"), v);
            return this;
        }
        public Params bestOf(int v) {
            seg.set(ValueLayout.JAVA_INT, off("greedy_best_of"), v);
            return this;
        }
        public Params beamSize(int v) {
            seg.set(ValueLayout.JAVA_INT, off("beam_size"), v);
            return this;
        }
        public Params temperature(float v) {
            seg.set(ValueLayout.JAVA_FLOAT, off("temperature"), v);
            return this;
        }
        public Params temperatureInc(float v) {
            seg.set(ValueLayout.JAVA_FLOAT, off("temperature_inc"), v);
            return this;
        }

        /** Raw struct memory — any other field via PARAMS_LAYOUT offsets. */
        public MemorySegment memory() { return seg; }
    }

    private MemorySegment ctx;

    public WhisperTpu(String modelPath) {
        try (Arena arena = Arena.ofConfined()) {
            ctx = (MemorySegment) INIT.invoke(
                    arena.allocateFrom(modelPath));
        } catch (Throwable t) {
            throw new RuntimeException(t);
        }
        if (ctx.equals(MemorySegment.NULL)) {
            throw new IllegalArgumentException(
                    "unable to load model " + modelPath);
        }
    }

    /**
     * Run the full pipeline on 16 kHz f32 PCM.  paramsJson uses the JSON
     * params surface (field names match whisper_full_params), e.g.
     * {@code {"language":"en","beam_size":5,"temperature_inc":0}};
     * null/"" selects reference defaults.
     */
    public List<Segment> fullTranscribe(float[] samples, String paramsJson) {
        try (Arena arena = Arena.ofConfined()) {
            MemorySegment pcm = arena.allocateFrom(
                    ValueLayout.JAVA_FLOAT, samples);
            MemorySegment pj = paramsJson == null || paramsJson.isEmpty()
                    ? MemorySegment.NULL : arena.allocateFrom(paramsJson);
            int rc = (int) FULL_JSON.invoke(ctx, pj, pcm, samples.length);
            if (rc != 0) {
                throw new RuntimeException("whisper_full failed rc=" + rc);
            }
            return segments();
        } catch (Throwable t) {
            throw new RuntimeException(t);
        }
    }

    /** new_segment_callback target: read the n_new freshest segments with
     *  the live accessors and forward them to the listener (mirrors the
     *  reference Go binding's C trampoline, bindings/go/whisper.go). */
    private void onNewSegments(SegmentListener listener,
                               MemorySegment c, MemorySegment st,
                               int nNew, MemorySegment ud) {
        try {
            int n = (int) N_SEGMENTS.invoke(ctx);
            for (int i = n - nNew; i < n; i++) {
                MemorySegment s = ((MemorySegment) SEG_TEXT.invoke(ctx, i))
                        .reinterpret(Long.MAX_VALUE);
                listener.onSegment(new Segment((long) SEG_T0.invoke(ctx, i),
                        (long) SEG_T1.invoke(ctx, i), s.getString(0)));
            }
        } catch (Throwable t) {
            throw new RuntimeException(t);
        }
    }

    /**
     * Run the full pipeline through the REAL whisper_full(struct by value)
     * entry point, streaming each newly generated segment to {@code
     * listener} mid-run via an FFM upcall stub installed as
     * new_segment_callback (null listener = no callback).  The Arena the
     * Params was built with must stay open across this call (it owns the
     * struct and any string fields); the upcall stub itself lives in a
     * call-scoped arena here.
     */
    public List<Segment> fullTranscribeStreaming(float[] samples,
                                                 Params params,
                                                 SegmentListener listener) {
        try (Arena arena = Arena.ofConfined()) {
            if (listener != null) {
                MethodHandle target = MethodHandles.lookup().bind(
                        this, "onNewSegments",
                        MethodType.methodType(void.class,
                                SegmentListener.class, MemorySegment.class,
                                MemorySegment.class, int.class,
                                MemorySegment.class))
                        .bindTo(listener);
                MemorySegment stub = LINKER.upcallStub(target,
                        FunctionDescriptor.ofVoid(ValueLayout.ADDRESS,
                                ValueLayout.ADDRESS, ValueLayout.JAVA_INT,
                                ValueLayout.ADDRESS),
                        arena);
                params.seg.set(ValueLayout.ADDRESS,
                        off("new_segment_callback"), stub);
            }
            MemorySegment pcm = arena.allocateFrom(
                    ValueLayout.JAVA_FLOAT, samples);
            int rc;
            try {
                rc = (int) FULL_STRUCT.invoke(ctx, params.seg, pcm,
                        samples.length);
            } finally {
                // the upcall stub dies with this call's arena — clear it so
                // a reused Params cannot carry a dangling function pointer
                // into a later whisper_full
                params.seg.set(ValueLayout.ADDRESS,
                        off("new_segment_callback"), MemorySegment.NULL);
            }
            if (rc != 0) {
                throw new RuntimeException("whisper_full failed rc=" + rc);
            }
            return segments();
        } catch (Throwable t) {
            throw new RuntimeException(t);
        }
    }

    public List<Segment> segments() {
        try {
            int n = (int) N_SEGMENTS.invoke(ctx);
            List<Segment> out = new ArrayList<>(n);
            for (int i = 0; i < n; i++) {
                MemorySegment s = ((MemorySegment) SEG_TEXT.invoke(ctx, i))
                        .reinterpret(Long.MAX_VALUE);
                out.add(new Segment((long) SEG_T0.invoke(ctx, i),
                        (long) SEG_T1.invoke(ctx, i),
                        s.getString(0)));
            }
            return out;
        } catch (Throwable t) {
            throw new RuntimeException(t);
        }
    }

    /** Language chosen by the last run ("en", "es", ...). */
    public String detectedLanguage() {
        try {
            int id = (int) LANG_ID.invoke(ctx);
            return ((MemorySegment) LANG_STR.invoke(id))
                    .reinterpret(Long.MAX_VALUE).getString(0);
        } catch (Throwable t) {
            throw new RuntimeException(t);
        }
    }

    @Override
    public void close() {
        if (ctx != null && !ctx.equals(MemorySegment.NULL)) {
            try {
                FREE.invoke(ctx);
            } catch (Throwable t) {
                throw new RuntimeException(t);
            }
            ctx = null;
        }
    }
}
