{
  "targets": [
    {
      "target_name": "whisper_tpu",
      "sources": ["addon.cpp"],
      "include_dirs": [
        "<!@(node -p \"require('node-addon-api').include\")",
        "../../native"
      ],
      "libraries": [
        "-L<(module_root_dir)/../../native", "-lwhisper_tpu",
        "-Wl,-rpath,<(module_root_dir)/../../native"
      ],
      "cflags_cc": ["-std=c++17", "-fexceptions"],
      "defines": ["NAPI_CPP_EXCEPTIONS"]
    }
  ]
}
