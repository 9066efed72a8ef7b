#include "pjrt_runner/pjrt_loader.hpp"

#include <dlfcn.h>

#include <fstream>
#include <sstream>
#include <stdexcept>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace pjrt_runner {

namespace {

std::string ReadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

size_t ElementSizeBytes(PJRT_Buffer_Type type) {
  switch (type) {
    case PJRT_Buffer_Type_PRED:
    case PJRT_Buffer_Type_S8:
    case PJRT_Buffer_Type_U8:
      return 1;
    case PJRT_Buffer_Type_S16:
    case PJRT_Buffer_Type_U16:
    case PJRT_Buffer_Type_F16:
    case PJRT_Buffer_Type_BF16:
      return 2;
    case PJRT_Buffer_Type_S32:
    case PJRT_Buffer_Type_U32:
    case PJRT_Buffer_Type_F32:
      return 4;
    case PJRT_Buffer_Type_S64:
    case PJRT_Buffer_Type_U64:
    case PJRT_Buffer_Type_F64:
    case PJRT_Buffer_Type_C64:
      return 8;
    default:
      throw std::runtime_error("unsupported output element type");
  }
}

}  // namespace

void PjrtLoader::Check(void* error) const {
  if (error == nullptr) return;
  auto* err = static_cast<PJRT_Error*>(error);
  PJRT_Error_Message_Args margs;
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.extension_start = nullptr;
  margs.error = err;
  api_->PJRT_Error_Message(&margs);
  std::string message(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.extension_start = nullptr;
  dargs.error = err;
  api_->PJRT_Error_Destroy(&dargs);
  throw std::runtime_error("PJRT error: " + message);
}

PjrtLoader::PjrtLoader(const std::string& plugin_path,
                       const std::vector<ClientOption>& options) {
  dl_handle_ = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!dl_handle_) {
    throw std::runtime_error(std::string("dlopen failed: ") + dlerror());
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api =
      reinterpret_cast<GetPjrtApiFn>(dlsym(dl_handle_, "GetPjrtApi"));
  if (!get_api) {
    throw std::runtime_error("plugin does not export GetPjrtApi");
  }
  api_ = get_api();

  // Some plugins (libtpu) require explicit initialization.
  if (api_->PJRT_Plugin_Initialize != nullptr) {
    PJRT_Plugin_Initialize_Args init_args;
    init_args.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    init_args.extension_start = nullptr;
    Check(api_->PJRT_Plugin_Initialize(&init_args));
  }

  std::vector<PJRT_NamedValue> named(options.size());
  for (size_t i = 0; i < options.size(); ++i) {
    const ClientOption& o = options[i];
    PJRT_NamedValue& v = named[i];
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.extension_start = nullptr;
    v.name = o.name.c_str();
    v.name_size = o.name.size();
    if (o.is_int) {
      v.type = PJRT_NamedValue_kInt64;
      v.int64_value = o.int_value;
      v.value_size = 1;
    } else {
      v.type = PJRT_NamedValue_kString;
      v.string_value = o.str_value.c_str();
      v.value_size = o.str_value.size();
    }
  }

  PJRT_Client_Create_Args cargs;
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.extension_start = nullptr;
  cargs.create_options = named.empty() ? nullptr : named.data();
  cargs.num_options = named.size();
  cargs.kv_get_callback = nullptr;
  cargs.kv_get_user_arg = nullptr;
  cargs.kv_put_callback = nullptr;
  cargs.kv_put_user_arg = nullptr;
  cargs.kv_try_get_callback = nullptr;
  cargs.kv_try_get_user_arg = nullptr;
  cargs.client = nullptr;
  Check(api_->PJRT_Client_Create(&cargs));
  client_ = cargs.client;

  PJRT_Client_PlatformName_Args pargs;
  pargs.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  pargs.extension_start = nullptr;
  pargs.client = client_;
  Check(api_->PJRT_Client_PlatformName(&pargs));
  platform_.assign(pargs.platform_name, pargs.platform_name_size);

  PJRT_Client_AddressableDevices_Args dargs;
  dargs.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  dargs.extension_start = nullptr;
  dargs.client = client_;
  Check(api_->PJRT_Client_AddressableDevices(&dargs));
  if (dargs.num_addressable_devices == 0) {
    throw std::runtime_error("no addressable devices");
  }
  device_ = dargs.addressable_devices[0];
}

PjrtLoader::~PjrtLoader() {
  if (executable_ != nullptr && api_ != nullptr) {
    PJRT_LoadedExecutable_Destroy_Args args;
    args.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
    args.extension_start = nullptr;
    args.executable = executable_;
    api_->PJRT_LoadedExecutable_Destroy(&args);
  }
  if (client_ != nullptr && api_ != nullptr) {
    PJRT_Client_Destroy_Args args;
    args.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    args.extension_start = nullptr;
    args.client = client_;
    api_->PJRT_Client_Destroy(&args);
  }
  if (dl_handle_ != nullptr) dlclose(dl_handle_);
}

void PjrtLoader::Compile(const std::string& stablehlo_path,
                         const std::string& compile_options_path) {
  std::string code = ReadFile(stablehlo_path);
  static const char kFormat[] = "mlir";

  PJRT_Program program;
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.extension_start = nullptr;
  program.code = code.data();
  program.code_size = code.size();
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  std::string compile_options;
  if (!compile_options_path.empty()) {
    compile_options = ReadFile(compile_options_path);
  }

  PJRT_Client_Compile_Args args;
  args.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  args.extension_start = nullptr;
  args.client = client_;
  args.program = &program;
  // Empty CompileOptionsProto: most plugins fill in defaults (1 replica);
  // libtpu-AOT paths need the explicit proto.
  args.compile_options = compile_options.data();
  args.compile_options_size = compile_options.size();
  args.executable = nullptr;
  Check(api_->PJRT_Client_Compile(&args));
  executable_ = args.executable;

  PJRT_LoadedExecutable_GetExecutable_Args gargs;
  gargs.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  gargs.extension_start = nullptr;
  gargs.loaded_executable = executable_;
  gargs.executable = nullptr;
  Check(api_->PJRT_LoadedExecutable_GetExecutable(&gargs));

  PJRT_Executable_NumOutputs_Args nargs;
  nargs.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  nargs.extension_start = nullptr;
  nargs.executable = gargs.executable;
  Check(api_->PJRT_Executable_NumOutputs(&nargs));
  num_outputs_ = nargs.num_outputs;
}

std::vector<HostTensor> PjrtLoader::Run(const uint8_t* data,
                                        const std::vector<int64_t>& dims) {
  if (executable_ == nullptr) throw std::runtime_error("Compile() first");

  // H2D: one uint8 input buffer.
  PJRT_Client_BufferFromHostBuffer_Args hargs;
  hargs.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  hargs.extension_start = nullptr;
  hargs.client = client_;
  hargs.data = data;
  hargs.type = PJRT_Buffer_Type_U8;
  hargs.dims = dims.data();
  hargs.num_dims = dims.size();
  hargs.byte_strides = nullptr;
  hargs.num_byte_strides = 0;
  hargs.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  hargs.device = device_;
  hargs.memory = nullptr;
  hargs.device_layout = nullptr;
  hargs.done_with_host_buffer = nullptr;
  hargs.buffer = nullptr;
  Check(api_->PJRT_Client_BufferFromHostBuffer(&hargs));
  PJRT_Buffer* input = hargs.buffer;

  {
    PJRT_Event_Await_Args eargs;
    eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    eargs.extension_start = nullptr;
    eargs.event = hargs.done_with_host_buffer;
    Check(api_->PJRT_Event_Await(&eargs));
    PJRT_Event_Destroy_Args edargs;
    edargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    edargs.extension_start = nullptr;
    edargs.event = eargs.event;
    Check(api_->PJRT_Event_Destroy(&edargs));
  }

  // Execute on one device.
  PJRT_ExecuteOptions options;
  options.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
  options.extension_start = nullptr;
  options.send_callbacks = nullptr;
  options.recv_callbacks = nullptr;
  options.num_send_ops = 0;
  options.num_recv_ops = 0;
  options.launch_id = 0;
  options.non_donatable_input_indices = nullptr;
  options.num_non_donatable_input_indices = 0;
  options.context = nullptr;

  PJRT_Buffer* arg_list[1] = {input};
  PJRT_Buffer* const* device_args[1] = {arg_list};
  std::vector<PJRT_Buffer*> outputs(num_outputs_, nullptr);
  PJRT_Buffer** output_lists[1] = {outputs.data()};
  PJRT_Event* complete[1] = {nullptr};

  PJRT_LoadedExecutable_Execute_Args xargs;
  xargs.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  xargs.extension_start = nullptr;
  xargs.executable = executable_;
  xargs.options = &options;
  xargs.argument_lists = device_args;
  xargs.num_devices = 1;
  xargs.num_args = 1;
  xargs.output_lists = output_lists;
  xargs.device_complete_events = complete;
  xargs.execute_device = device_;
  Check(api_->PJRT_LoadedExecutable_Execute(&xargs));

  {
    PJRT_Event_Await_Args eargs;
    eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    eargs.extension_start = nullptr;
    eargs.event = complete[0];
    Check(api_->PJRT_Event_Await(&eargs));
    PJRT_Event_Destroy_Args edargs;
    edargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    edargs.extension_start = nullptr;
    edargs.event = complete[0];
    Check(api_->PJRT_Event_Destroy(&edargs));
  }

  // D2H copies — with an explicit dense row-major host layout: without it
  // some plugins hand back the buffer in its on-device (tiled/transposed)
  // layout.
  std::vector<HostTensor> host(num_outputs_);
  for (size_t i = 0; i < num_outputs_; ++i) {
    PJRT_Buffer_Dimensions_Args dim_args;
    dim_args.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    dim_args.extension_start = nullptr;
    dim_args.buffer = outputs[i];
    Check(api_->PJRT_Buffer_Dimensions(&dim_args));

    // dense row-major = minor_to_major [n-1, ..., 0], no tiles (the same
    // layout jaxlib's ToLiteral passes)
    std::vector<int64_t> minor_to_major(dim_args.num_dims);
    for (size_t d = 0; d < dim_args.num_dims; ++d) {
      minor_to_major[d] = static_cast<int64_t>(dim_args.num_dims - 1 - d);
    }
    PJRT_Buffer_MemoryLayout layout;
    layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
    layout.extension_start = nullptr;
    layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
    layout.tiled.minor_to_major = minor_to_major.data();
    layout.tiled.minor_to_major_size = minor_to_major.size();
    layout.tiled.tile_dims = nullptr;
    layout.tiled.tile_dim_sizes = nullptr;
    layout.tiled.num_tiles = 0;

    PJRT_Buffer_ToHostBuffer_Args targs;
    targs.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    targs.extension_start = nullptr;
    targs.src = outputs[i];
    targs.host_layout = &layout;
    targs.dst = nullptr;
    targs.dst_size = 0;
    targs.event = nullptr;
    Check(api_->PJRT_Buffer_ToHostBuffer(&targs));  // size query
    host[i].size_bytes = targs.dst_size;
    host[i].bytes.resize(targs.dst_size);
    targs.dst = host[i].bytes.data();
    Check(api_->PJRT_Buffer_ToHostBuffer(&targs));
    PJRT_Event_Await_Args eargs;
    eargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    eargs.extension_start = nullptr;
    eargs.event = targs.event;
    Check(api_->PJRT_Event_Await(&eargs));
    PJRT_Event_Destroy_Args edargs;
    edargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    edargs.extension_start = nullptr;
    edargs.event = targs.event;
    Check(api_->PJRT_Event_Destroy(&edargs));
  }

  // Free device buffers.
  for (PJRT_Buffer* b : outputs) {
    PJRT_Buffer_Destroy_Args bargs;
    bargs.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    bargs.extension_start = nullptr;
    bargs.buffer = b;
    api_->PJRT_Buffer_Destroy(&bargs);
  }
  PJRT_Buffer_Destroy_Args bargs;
  bargs.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  bargs.extension_start = nullptr;
  bargs.buffer = input;
  api_->PJRT_Buffer_Destroy(&bargs);

  return host;
}

}  // namespace pjrt_runner
