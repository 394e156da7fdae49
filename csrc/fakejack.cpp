// fakejack: an in-process stand-in for libjack, used by the hermetic tests
// of the beamio JACK adapter (csrc/beamio.cpp, tests/test_jack.py).
//
// No JACK server exists in this environment, so the adapter's dlopen path
// is pointed here via BEAMIO_JACK_LIB. The fake implements the ABI subset
// beamio binds — client/ports/callback registration, physical-port listing,
// connections — plus a test-driver API (fakejack_*) that invokes the
// registered process callback by hand with caller-supplied capture samples,
// standing in for the server's real-time thread.
//
// This mirrors how the reference is tested against a live jackd graph
// (rosjack.cpp:98-157): same call sequence, deterministic clock.

#include <cstdarg>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct FakePort {
  std::string name;
  unsigned long flags;
  std::vector<float> buf;
};

int (*g_process)(uint32_t, void*) = nullptr;
void* g_process_arg = nullptr;
void (*g_shutdown)(void*) = nullptr;
void* g_shutdown_arg = nullptr;
std::vector<FakePort*>* g_ports = nullptr;
std::vector<std::pair<std::string, std::string>>* g_connections = nullptr;
uint32_t g_nframes = 256;
uint32_t g_rate = 48000;
bool g_open = false;

std::vector<FakePort*>& ports() {
  if (!g_ports) g_ports = new std::vector<FakePort*>;
  return *g_ports;
}

std::vector<std::pair<std::string, std::string>>& connections() {
  if (!g_connections)
    g_connections = new std::vector<std::pair<std::string, std::string>>;
  return *g_connections;
}

// static, NULL-terminated physical-port name lists (jack_get_ports output;
// jack_free on them is a no-op here)
const char* kCapture[] = {
    "system:capture_1",  "system:capture_2",  "system:capture_3",
    "system:capture_4",  "system:capture_5",  "system:capture_6",
    "system:capture_7",  "system:capture_8",  "system:capture_9",
    "system:capture_10", "system:capture_11", "system:capture_12",
    "system:capture_13", "system:capture_14", "system:capture_15",
    "system:capture_16", nullptr};
const char* kPlayback[] = {"system:playback_1", "system:playback_2",
                           nullptr};

constexpr unsigned long kPortIsInput = 0x1;
constexpr unsigned long kPortIsOutput = 0x2;

}  // namespace

extern "C" {

// --------------------------- JACK ABI subset --------------------------------

void* jack_client_open(const char* name, int options, int* status, ...) {
  (void)name;
  (void)options;
  if (status) *status = 0;
  g_open = true;
  return (void*)0x1;
}

char* jack_get_client_name(void* client) {
  (void)client;
  static char name[] = "beamform_tpu";
  return name;
}

int jack_set_process_callback(void* client, int (*cb)(uint32_t, void*),
                              void* arg) {
  (void)client;
  g_process = cb;
  g_process_arg = arg;
  return 0;
}

void jack_on_shutdown(void* client, void (*cb)(void*), void* arg) {
  (void)client;
  g_shutdown = cb;
  g_shutdown_arg = arg;
}

int jack_set_xrun_callback(void* client, int (*cb)(void*), void* arg) {
  (void)client;
  (void)cb;
  (void)arg;
  return 0;
}

uint32_t jack_get_buffer_size(void* client) {
  (void)client;
  return g_nframes;
}

uint32_t jack_get_sample_rate(void* client) {
  (void)client;
  return g_rate;
}

void* jack_port_register(void* client, const char* name, const char* type,
                         unsigned long flags, unsigned long bufsize) {
  (void)client;
  (void)type;
  (void)bufsize;
  auto* p = new FakePort{std::string("beamform_tpu:") + name, flags, {}};
  p->buf.resize(g_nframes, 0.0f);
  ports().push_back(p);
  return p;
}

const char* jack_port_name(void* port) {
  return ((FakePort*)port)->name.c_str();
}

void* jack_port_get_buffer(void* port, uint32_t nframes) {
  auto* p = (FakePort*)port;
  if (p->buf.size() < nframes) p->buf.resize(nframes, 0.0f);
  return p->buf.data();
}

int jack_activate(void* client) {
  (void)client;
  return 0;
}

int jack_deactivate(void* client) {
  (void)client;
  return 0;
}

int jack_client_close(void* client) {
  (void)client;
  g_open = false;
  g_process = nullptr;
  for (auto* p : ports()) delete p;
  ports().clear();
  connections().clear();
  return 0;
}

const char** jack_get_ports(void* client, const char* name_pattern,
                            const char* type_pattern, unsigned long flags) {
  (void)client;
  (void)name_pattern;
  (void)type_pattern;
  // physical capture ports are outputs FROM the server's point of view
  if (flags & kPortIsOutput) return kCapture;
  if (flags & kPortIsInput) return kPlayback;
  return nullptr;
}

int jack_connect(void* client, const char* src, const char* dst) {
  (void)client;
  connections().emplace_back(src, dst);
  return 0;
}

void jack_free(void* ptr) { (void)ptr; }  // static name lists

// ------------------------- test driver API ----------------------------------
// Stands in for the server's real-time thread: one call = one process cycle.

// Feed `nframes` frames of `channels`-channel interleaved capture audio to
// the registered input ports, run the process callback, and copy the
// client's output-port buffer to out_mono. Returns 0, or -1 when no client
// callback is registered.
int fakejack_drive(const float* in_interleaved, uint32_t nframes,
                   int channels, float* out_mono) {
  if (!g_process) return -1;
  g_nframes = nframes;
  int c = 0;
  FakePort* out_port = nullptr;
  for (auto* p : ports()) {
    if ((p->flags & kPortIsInput) && c < channels) {
      if (p->buf.size() < nframes) p->buf.resize(nframes, 0.0f);
      for (uint32_t i = 0; i < nframes; ++i)
        p->buf[i] = in_interleaved[i * channels + c];
      ++c;
    } else if (p->flags & kPortIsOutput) {
      out_port = p;
    }
  }
  int rc = g_process(nframes, g_process_arg);
  if (out_mono && out_port)
    memcpy(out_mono, out_port->buf.data(), nframes * sizeof(float));
  return rc;
}

int fakejack_num_connections(void) { return (int)connections().size(); }

// nth connection as "src -> dst"; returns chars written or 0 when n is out
// of range.
int fakejack_connection(int n, char* buf, int buflen) {
  auto& cs = connections();
  if (n < 0 || n >= (int)cs.size()) return 0;
  return snprintf(buf, (size_t)buflen, "%s -> %s", cs[n].first.c_str(),
                  cs[n].second.c_str());
}

// Simulate the server shutting down (jack_on_shutdown path).
void fakejack_shutdown(void) {
  if (g_shutdown) g_shutdown(g_shutdown_arg);
}

void fakejack_set_rate(uint32_t rate) { g_rate = rate; }
void fakejack_set_buffer_size(uint32_t n) { g_nframes = n; }
int fakejack_is_open(void) { return g_open ? 1 : 0; }

}  // extern "C"
