// Example driver for the whisper_tpu N-API addon — same call shape as
// the reference examples/addon.node/index.js.
//
// Usage: node index.js <model.bin> <audio.wav>
// (requires `npm install` to have built build/Release/whisper_tpu.node,
// and libwhisper_tpu.so built in ../../native — see that directory's
// Makefile.  STATUS: source-complete but unexecuted in this repository's
// CI; no Node.js runtime exists on the build host.)

const path = require("path");
const { promisify } = require("util");

const { whisper } = require(path.join(
  __dirname, "build", "Release", "whisper_tpu.node"));
const whisperAsync = promisify(whisper);

const [model, fname] = process.argv.slice(2);

whisperAsync({
  model: model,
  fname_inp: fname,
  language: "en",
  best_of: 1,
  comma_in_time: false,
  progress_callback: (p) => console.log(`progress: ${p}%`),
}).then((result) => {
  console.log("language:", result.result.language);
  for (const [t0, t1, text] of result.transcription) {
    console.log(`[${t0} --> ${t1}] ${text}`);
  }
}).catch((err) => {
  console.error(err);
  process.exit(1);
});
