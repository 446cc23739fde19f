// Package whisper provides Go bindings for the whisper_tpu engine.
//
// Mirrors the reference binding's shape (whisper.cpp bindings/go/whisper.go):
// a thin cgo wrapper over the whisper.h-style C ABI exported by
// libwhisper_tpu.so (native/whisper_tpu.h), with an idiomatic Context type
// on top.  Build with the library and header on the search paths:
//
//	CGO_CFLAGS="-I$REPO/native" CGO_LDFLAGS="-L$BUILD -lwhisper_tpu" go test ./...
//
// tests/test_bindings.py builds and runs the smoke test when a Go
// toolchain is available.
package whisper

/*
#cgo LDFLAGS: -lwhisper_tpu
#include <stdlib.h>
#include <whisper_tpu.h>
*/
import "C"

import (
	"errors"
	"unsafe"
)

var (
	ErrUnableToLoadModel = errors.New("whisper_tpu: unable to load model")
	ErrTranscribeFailed  = errors.New("whisper_tpu: whisper_full failed")
)

// Segment is one decoded segment; T0/T1 are in 10 ms ticks, matching the
// reference whisper_segment semantics.
type Segment struct {
	T0, T1       int64
	Text         string
	NoSpeechProb float32
}

// Context wraps a loaded model (reference: whisper.Context).
type Context struct {
	ctx *C.struct_whisper_context
}

// New loads a ggml model file.
func New(modelPath string) (*Context, error) {
	cPath := C.CString(modelPath)
	defer C.free(unsafe.Pointer(cPath))
	ctx := C.whisper_init_from_file(cPath)
	if ctx == nil {
		return nil, ErrUnableToLoadModel
	}
	return &Context{ctx: ctx}, nil
}

// Close releases the model.
func (c *Context) Close() {
	if c.ctx != nil {
		C.whisper_free(c.ctx)
		c.ctx = nil
	}
}

// Transcribe runs the full pipeline over 16 kHz mono f32 samples.
// paramsJSON == "" uses the reference defaults; see
// whisper_full_default_params_json for the editable fields.
func (c *Context) Transcribe(samples []float32, paramsJSON string) ([]Segment, error) {
	var cParams *C.char
	if paramsJSON != "" {
		cParams = C.CString(paramsJSON)
		defer C.free(unsafe.Pointer(cParams))
	}
	rc := C.whisper_full_json(c.ctx, cParams,
		(*C.float)(unsafe.Pointer(&samples[0])), C.int(len(samples)))
	if rc != 0 {
		return nil, ErrTranscribeFailed
	}
	n := int(C.whisper_full_n_segments(c.ctx))
	out := make([]Segment, 0, n)
	for i := 0; i < n; i++ {
		out = append(out, Segment{
			T0:           int64(C.whisper_full_get_segment_t0(c.ctx, C.int(i))),
			T1:           int64(C.whisper_full_get_segment_t1(c.ctx, C.int(i))),
			Text:         C.GoString(C.whisper_full_get_segment_text(c.ctx, C.int(i))),
			NoSpeechProb: float32(C.whisper_full_get_segment_no_speech_prob(c.ctx, C.int(i))),
		})
	}
	return out, nil
}

// Tokenize splits text into model tokens.
func (c *Context) Tokenize(text string) ([]int, error) {
	cText := C.CString(text)
	defer C.free(unsafe.Pointer(cText))
	max := C.whisper_token_count(c.ctx, cText)
	toks := make([]C.int, int(max))
	n := C.whisper_tokenize(c.ctx, cText, &toks[0], max)
	if n < 0 {
		return nil, errors.New("whisper_tpu: tokenize failed")
	}
	out := make([]int, int(n))
	for i := range out {
		out[i] = int(toks[i])
	}
	return out, nil
}

// TokenToString renders one token id.
func (c *Context) TokenToString(token int) string {
	return C.GoString(C.whisper_token_to_str(c.ctx, C.int(token)))
}

// Model / vocab introspection.
func (c *Context) NVocab() int          { return int(C.whisper_n_vocab(c.ctx)) }
func (c *Context) IsMultilingual() bool { return C.whisper_is_multilingual(c.ctx) != 0 }
func (c *Context) TokenEOT() int        { return int(C.whisper_token_eot(c.ctx)) }
func (c *Context) TokenSOT() int        { return int(C.whisper_token_sot(c.ctx)) }
func (c *Context) ModelType() string {
	return C.GoString(C.whisper_model_type_readable(c.ctx))
}

// Version reports the engine version string.
func Version() string { return C.GoString(C.whisper_version()) }

// Lang helpers (reference whisper_lang_*).
func LangId(lang string) int {
	cLang := C.CString(lang)
	defer C.free(unsafe.Pointer(cLang))
	return int(C.whisper_lang_id(cLang))
}

func LangStr(id int) string { return C.GoString(C.whisper_lang_str(C.int(id))) }
