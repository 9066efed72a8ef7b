/// PJRT program loader — the TPU-native equivalent of the reference's
/// TorchScript/TensorRT loaders (cpp/src/torchscript_loader/
/// torchscript_loader.cpp:11-58, cpp/src/trt_loader/trt_loader.cpp:17-131).
///
/// Loads a PJRT plugin (libtpu.so or any PJRT C-API .so), creates a client,
/// compiles a serialized StableHLO module (the `.stablehlo` artifact written
/// by ayolov2_tpu.export), and runs image-batch -> detection-buffer
/// inference with reusable device buffers.

#pragma once

#include <cstdint>
#include <string>
#include <vector>

// Forward declarations from the PJRT C API (xla/pjrt/c/pjrt_c_api.h).
typedef struct PJRT_Api PJRT_Api;
typedef struct PJRT_Client PJRT_Client;
typedef struct PJRT_Device PJRT_Device;
typedef struct PJRT_LoadedExecutable PJRT_LoadedExecutable;

namespace pjrt_runner {

/// One host-side output tensor (row-major).
struct HostTensor {
  std::vector<uint8_t> bytes;
  size_t size_bytes = 0;
};

/// One client-create option (PJRT_NamedValue): plugins like libtpu work
/// with none; proxy plugins (e.g. a remote-TPU terminal) require options
/// such as topology/session ids. Ints and strings cover the PJRT surface
/// actually used by the plugins we target.
struct ClientOption {
  std::string name;
  bool is_int = false;
  int64_t int_value = 0;
  std::string str_value;
};

class PjrtLoader {
 public:
  /// dlopen the plugin and create a client.
  explicit PjrtLoader(const std::string& plugin_path,
                      const std::vector<ClientOption>& options = {});
  ~PjrtLoader();

  PjrtLoader(const PjrtLoader&) = delete;
  PjrtLoader& operator=(const PjrtLoader&) = delete;

  /// Compile a StableHLO (MLIR bytecode) program.
  ///
  /// ``compile_options_path``: optional serialized xla CompileOptionsProto
  /// (written next to the artifact by ayolov2_tpu.export). Some plugins
  /// accept an empty proto and default to 1 replica; libtpu-AOT paths
  /// require the explicit num_replicas=1, so pass it when available.
  void Compile(const std::string& stablehlo_path,
               const std::string& compile_options_path = "");

  /// Number of outputs of the compiled program.
  size_t NumOutputs() const { return num_outputs_; }

  /// Platform name reported by the client (e.g. "tpu", "cpu").
  const std::string& platform() const { return platform_; }

  /// Run one batch: uint8 NHWC input of the exported static shape.
  /// Returns the host copies of every output buffer.
  std::vector<HostTensor> Run(const uint8_t* data,
                              const std::vector<int64_t>& dims);

 private:
  void Check(void* error) const;  // PJRT_Error* -> throw with message

  void* dl_handle_ = nullptr;
  const PJRT_Api* api_ = nullptr;
  PJRT_Client* client_ = nullptr;
  PJRT_Device* device_ = nullptr;
  PJRT_LoadedExecutable* executable_ = nullptr;
  size_t num_outputs_ = 0;
  std::string platform_;
};

}  // namespace pjrt_runner
