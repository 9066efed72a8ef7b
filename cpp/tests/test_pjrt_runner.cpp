/// Assert-based tests for the PJRT runner (no gtest in the image; the
/// reference's cpp test was likewise a minimal scaffold,
/// cpp/tests/test_second_module.cpp:12-27).

#include <cassert>
#include <iostream>
#include <stdexcept>
#include <string>

#include "pjrt_runner/pjrt_loader.hpp"

namespace {

void TestBadPluginThrows() {
  bool threw = false;
  try {
    pjrt_runner::PjrtLoader loader("/nonexistent/plugin.so");
  } catch (const std::runtime_error& e) {
    threw = true;
    assert(std::string(e.what()).find("dlopen") != std::string::npos);
  }
  assert(threw);
}

void TestRunBeforeCompileThrows() {
  // Needs a real plugin; only run when PJRT_PLUGIN is set.
  const char* plugin = std::getenv("PJRT_PLUGIN");
  if (plugin == nullptr) {
    std::cout << "PJRT_PLUGIN not set; skipping live-plugin test\n";
    return;
  }
  pjrt_runner::PjrtLoader loader(plugin);
  bool threw = false;
  try {
    std::vector<int64_t> dims = {1, 2, 2, 3};
    uint8_t data[12] = {0};
    loader.Run(data, dims);
  } catch (const std::runtime_error&) {
    threw = true;
  }
  assert(threw);
  std::cout << "live plugin platform: " << loader.platform() << "\n";
}

}  // namespace

int main() {
  TestBadPluginThrows();
  TestRunBeforeCompileThrows();
  std::cout << "all cpp tests passed\n";
  return 0;
}
