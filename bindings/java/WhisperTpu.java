/**
 * Java binding for the whisper_tpu engine.
 *
 * Mirrors the reference Java binding's surface (whisper.cpp bindings/java:
 * io.github.ggerganov.whispercpp.WhisperCpp — init/fullTranscribe/segment
 * accessors) over the C ABI exported by libwhisper_tpu.so
 * (native/whisper_tpu.h), using the java.lang.foreign FFM API (JDK 22+)
 * instead of JNA — no native glue to compile.  Params travel via the
 * *_json convenience entry points (whisper_tpu.h:44-61); the five C
 * function-pointer callbacks of whisper_full_params are reachable with FFM
 * upcall stubs against the struct entry points for consumers that need
 * mid-run streaming (the CI-run C hosts demonstrate that surface).
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
import java.lang.foreign.MemorySegment;
import java.lang.foreign.SymbolLookup;
import java.lang.foreign.ValueLayout;
import java.lang.invoke.MethodHandle;
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
