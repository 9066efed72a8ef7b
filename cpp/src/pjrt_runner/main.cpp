/// PJRT runner CLI — load a .stablehlo serving artifact and benchmark it.
///
/// Parity target: the reference's C++ runner mains —
/// cpp/src/torchscript_runner/main.cpp:20-51 (137-iteration benchmark of a
/// (32, 3, 640, 640) forward with wall-clock report) and
/// cpp/src/tensorrt_runner/main.cpp:17-25 (engine load + report).
///
/// Usage:
///   pjrt_runner --plugin /path/to/libtpu.so --program model.stablehlo \
///               --batch 32 --height 640 --width 640 --iters 137

#include <chrono>
#include <cstring>
#include <iostream>
#include <string>
#include <vector>

#include "pjrt_runner/pjrt_loader.hpp"

namespace {

struct Options {
  std::string plugin;
  std::string program;
  int64_t batch = 32;
  int64_t height = 640;
  int64_t width = 640;
  int iters = 137;  // torchscript_runner main.cpp benchmark length
  int warmup = 3;
};

bool ParseArgs(int argc, char** argv, Options* opt) {
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> const char* {
      if (i + 1 >= argc) return nullptr;
      return argv[++i];
    };
    if (a == "--plugin") {
      const char* v = next();
      if (!v) return false;
      opt->plugin = v;
    } else if (a == "--program") {
      const char* v = next();
      if (!v) return false;
      opt->program = v;
    } else if (a == "--batch") {
      opt->batch = std::stol(next());
    } else if (a == "--height") {
      opt->height = std::stol(next());
    } else if (a == "--width") {
      opt->width = std::stol(next());
    } else if (a == "--iters") {
      opt->iters = std::stoi(next());
    } else if (a == "--warmup") {
      opt->warmup = std::stoi(next());
    } else {
      std::cerr << "unknown arg: " << a << "\n";
      return false;
    }
  }
  return !opt->plugin.empty() && !opt->program.empty();
}

}  // namespace

int main(int argc, char** argv) {
  Options opt;
  if (!ParseArgs(argc, argv, &opt)) {
    std::cerr << "usage: pjrt_runner --plugin <pjrt_plugin.so> --program "
                 "<model.stablehlo> [--batch N] [--height H] [--width W] "
                 "[--iters N]\n";
    return 2;
  }

  try {
    pjrt_runner::PjrtLoader loader(opt.plugin);
    std::cout << "platform: " << loader.platform() << "\n";
    loader.Compile(opt.program);
    std::cout << "compiled " << opt.program << " (" << loader.NumOutputs()
              << " outputs)\n";

    const std::vector<int64_t> dims = {opt.batch, opt.height, opt.width, 3};
    std::vector<uint8_t> image(opt.batch * opt.height * opt.width * 3, 114);

    for (int i = 0; i < opt.warmup; ++i) {
      loader.Run(image.data(), dims);
    }

    auto t0 = std::chrono::steady_clock::now();
    for (int i = 0; i < opt.iters; ++i) {
      loader.Run(image.data(), dims);
    }
    auto t1 = std::chrono::steady_clock::now();
    double ms =
        std::chrono::duration_cast<std::chrono::microseconds>(t1 - t0).count() /
        1000.0;
    double per_img = ms / (opt.iters * opt.batch);
    double img_per_sec = 1000.0 / per_img;
    std::cout << "benchmark: " << opt.iters << " iters of (" << opt.batch
              << ", " << opt.height << ", " << opt.width << ", 3) uint8\n"
              << "total " << ms << " ms, " << per_img << " ms/img, "
              << img_per_sec << " img/s\n";
  } catch (const std::exception& e) {
    std::cerr << "error: " << e.what() << "\n";
    return 1;
  }
  return 0;
}
