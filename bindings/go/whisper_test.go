package whisper

// Smoke test mirroring the reference binding test shape
// (bindings/go/pkg/whisper/context_test.go): load -> introspect ->
// tokenize -> transcribe -> segments.  Driven by tests/test_bindings.py
// with WHISPER_TPU_MODEL / WHISPER_TPU_PCM pointing at the fixtures.

import (
	"encoding/binary"
	"math"
	"os"
	"testing"
)

func readF32(t *testing.T, path string) []float32 {
	raw, err := os.ReadFile(path)
	if err != nil {
		t.Fatal(err)
	}
	out := make([]float32, len(raw)/4)
	for i := range out {
		out[i] = math.Float32frombits(binary.LittleEndian.Uint32(raw[4*i:]))
	}
	return out
}

func TestTranscribe(t *testing.T) {
	model := os.Getenv("WHISPER_TPU_MODEL")
	pcm := os.Getenv("WHISPER_TPU_PCM")
	if model == "" || pcm == "" {
		t.Skip("WHISPER_TPU_MODEL / WHISPER_TPU_PCM not set")
	}
	ctx, err := New(model)
	if err != nil {
		t.Fatal(err)
	}
	defer ctx.Close()

	if ctx.NVocab() <= 0 {
		t.Fatal("bad vocab")
	}
	toks, err := ctx.Tokenize("hello world")
	if err != nil || len(toks) == 0 {
		t.Fatalf("tokenize: %v %v", toks, err)
	}
	segments, err := ctx.Transcribe(readF32(t, pcm),
		`{"language": "en", "best_of": 1, "temperature_inc": 0}`)
	if err != nil {
		t.Fatal(err)
	}
	if len(segments) == 0 || segments[0].Text == "" {
		t.Fatalf("no segments: %+v", segments)
	}
	t.Logf("segments: %d, first: [%d -> %d] %q", len(segments),
		segments[0].T0, segments[0].T1, segments[0].Text)
}
