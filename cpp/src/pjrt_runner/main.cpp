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
#include <fstream>
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
  std::string compile_options;  // serialized CompileOptionsProto path
  std::string input;            // raw uint8 NHWC input file (else fill 114)
  std::string dump_output;      // prefix: write <prefix>.outN.bin per output
  std::vector<pjrt_runner::ClientOption> client_options;
};

// "--opt name=value": integer values become kInt64, everything else kString.
pjrt_runner::ClientOption ParseClientOption(const std::string& kv) {
  pjrt_runner::ClientOption o;
  auto eq = kv.find('=');
  if (eq == std::string::npos) {
    throw std::runtime_error("--opt expects name=value, got: " + kv);
  }
  o.name = kv.substr(0, eq);
  std::string value = kv.substr(eq + 1);
  try {
    size_t used = 0;
    int64_t iv = std::stoll(value, &used);
    if (used == value.size()) {
      o.is_int = true;
      o.int_value = iv;
      return o;
    }
  } catch (const std::exception&) {
  }
  o.str_value = value;
  return o;
}

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
    } else if (a == "--opt") {
      const char* v = next();
      if (!v) return false;
      opt->client_options.push_back(ParseClientOption(v));
    } else if (a == "--compile-options") {
      const char* v = next();
      if (!v) return false;
      opt->compile_options = v;
    } else if (a == "--input") {
      const char* v = next();
      if (!v) return false;
      opt->input = v;
    } else if (a == "--dump-output") {
      const char* v = next();
      if (!v) return false;
      opt->dump_output = v;
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
    pjrt_runner::PjrtLoader loader(opt.plugin, opt.client_options);
    std::cout << "platform: " << loader.platform() << "\n";
    loader.Compile(opt.program, opt.compile_options);
    std::cout << "compiled " << opt.program << " (" << loader.NumOutputs()
              << " outputs)\n";

    const std::vector<int64_t> dims = {opt.batch, opt.height, opt.width, 3};
    std::vector<uint8_t> image(opt.batch * opt.height * opt.width * 3, 114);
    if (!opt.input.empty()) {
      std::ifstream f(opt.input, std::ios::binary);
      if (!f) throw std::runtime_error("cannot open --input " + opt.input);
      f.read(reinterpret_cast<char*>(image.data()),
             static_cast<std::streamsize>(image.size()));
      if (f.gcount() != static_cast<std::streamsize>(image.size())) {
        throw std::runtime_error("--input smaller than batch*h*w*3 bytes");
      }
    }

    for (int i = 0; i < opt.warmup; ++i) {
      loader.Run(image.data(), dims);
    }

    if (!opt.dump_output.empty()) {
      // one verification run whose outputs are written for numeric
      // comparison against the Python jax.export artifact
      auto outs = loader.Run(image.data(), dims);
      for (size_t i = 0; i < outs.size(); ++i) {
        std::string path = opt.dump_output + ".out" + std::to_string(i) + ".bin";
        std::ofstream f(path, std::ios::binary);
        f.write(reinterpret_cast<const char*>(outs[i].bytes.data()),
                static_cast<std::streamsize>(outs[i].bytes.size()));
        std::cout << "wrote " << path << " (" << outs[i].size_bytes
                  << " bytes)\n";
      }
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
