// Microphone 2pass streaming client.
//
// Role of the reference's portaudio mic client
// (/root/reference/websocket/bin/funasr-wss-client-2pass.cpp +
// clients/cpp/websocket_client/microphone.cpp): capture live audio, send
// 2pass protocol frames, display pass-1 partials overwriting the current
// line and commit pass-2 finals.
//
// Audio sources (no build-time audio dependency):
//   --mic [device]   ALSA capture via dlopen("libasound.so.2") — works on
//                    any Linux box with ALSA installed, builds everywhere
//   --stdin          raw s16le mono 16 kHz from stdin (arecord | ...)
//   --file x.pcm     replay a file at real-time pace (testing)
//
// Build: g++ -O2 -std=c++17 -o mic_client_2pass mic_client_2pass.cc -ldl
// Run:   ./mic_client_2pass <host> <port> --mic [default]
//        arecord -f S16_LE -r 16000 -c 1 -t raw |
//            ./mic_client_2pass <host> <port> --stdin

#include <dlfcn.h>
#include <signal.h>

#include <atomic>
#include <chrono>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <thread>

#include "ws_mini.h"

using namespace wsmini;

namespace {

constexpr int kFs = 16000;
constexpr int kChunkSamples = 800;  // 50 ms per network frame
                                    // (websocket-server-2pass.cpp:135-137)

std::atomic<bool> g_stop{false};

void on_sigint(int) { g_stop = true; }

// ---- ALSA via dlopen: minimal prototypes, no headers needed ------------
struct Alsa {
  void* so = nullptr;
  void* pcm = nullptr;
  int (*open_)(void**, const char*, int, int) = nullptr;
  int (*set_params_)(void*, int, int, unsigned, unsigned, int,
                     unsigned) = nullptr;
  long (*readi_)(void*, void*, unsigned long) = nullptr;
  int (*close_)(void*) = nullptr;
  const char* (*strerror_)(int) = nullptr;

  bool init(const char* device) {
    so = dlopen("libasound.so.2", RTLD_NOW);
    if (!so) so = dlopen("libasound.so", RTLD_NOW);
    if (!so) {
      std::cerr << "ALSA not available (libasound.so not found); use "
                   "--stdin with arecord instead\n";
      return false;
    }
    open_ = (decltype(open_))dlsym(so, "snd_pcm_open");
    set_params_ = (decltype(set_params_))dlsym(so, "snd_pcm_set_params");
    readi_ = (decltype(readi_))dlsym(so, "snd_pcm_readi");
    close_ = (decltype(close_))dlsym(so, "snd_pcm_close");
    strerror_ = (decltype(strerror_))dlsym(so, "snd_strerror");
    if (!open_ || !set_params_ || !readi_ || !close_) return false;
    // SND_PCM_STREAM_CAPTURE=1; FORMAT_S16_LE=2; ACCESS_RW_INTERLEAVED=3
    int rc = open_(&pcm, device, 1, 0);
    if (rc < 0) {
      std::cerr << "snd_pcm_open(" << device
                << "): " << (strerror_ ? strerror_(rc) : "error") << "\n";
      return false;
    }
    rc = set_params_(pcm, 2, 3, 1, kFs, 1, 100000 /*0.1s latency*/);
    if (rc < 0) {
      std::cerr << "snd_pcm_set_params: "
                << (strerror_ ? strerror_(rc) : "error") << "\n";
      return false;
    }
    return true;
  }

  long read(int16_t* buf, long frames) {
    return readi_ ? readi_(pcm, buf, frames) : -1;
  }

  ~Alsa() {
    if (pcm && close_) close_(pcm);
    if (so) dlclose(so);
  }
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::cerr << "usage: " << argv[0]
              << " <host> <port> --mic [device] | --stdin | --file <pcm>"
                 " [--hotwords 'w1 w2'] [--no-itn]\n";
    return 1;
  }
  const std::string host = argv[1], port = argv[2], source = argv[3];
  std::string device = "default", file, hotwords;
  bool itn = true;
  for (int i = 4; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--no-itn") itn = false;
    else if (a == "--hotwords" && i + 1 < argc) hotwords = argv[++i];
    else if (source == "--file" && file.empty()) file = a;
    else if (source == "--mic") device = a;
  }
  if (source == "--file" && file.empty() && argc > 4) file = argv[4];

  int fd = dial(host, port);
  if (fd < 0 || !ws_handshake(fd, host + ":" + port)) {
    std::cerr << "connect/handshake failed\n";
    return 1;
  }
  std::string first =
      "{\"mode\": \"2pass\", \"chunk_size\": [5,10,5], "
      "\"chunk_interval\": 10, \"audio_fs\": 16000, "
      "\"wav_name\": \"mic\", \"wav_format\": \"pcm\", "
      "\"is_speaking\": true, \"hotwords\": \"" + hotwords + "\", "
      "\"itn\": " + (itn ? "true" : "false") + "}";
  ws_send(fd, 0x1, (const uint8_t*)first.data(), first.size());

  signal(SIGINT, on_sigint);

  // display thread: partials overwrite the line, finals commit
  // (funasr_wss_client.py:334-347 display logic)
  std::atomic<bool> done{false};
  std::thread rx([&] {
    std::string committed, partial, msg;
    uint8_t op;
    while (ws_recv(fd, &op, &msg)) {
      if (op != 0x1) continue;
      const std::string m = json_field(msg, "mode");
      const std::string text = json_field(msg, "text");
      if (m == "2pass-online") {
        partial += text;
      } else if (m == "2pass-offline") {
        partial.clear();
        committed += text;
      }
      std::cout << "\r\033[K" << committed << partial << std::flush;
      if (msg.find("\"is_final\": true") != std::string::npos ||
          msg.find("\"is_final\":true") != std::string::npos) {
        std::cout << std::endl;
        break;
      }
    }
    done = true;
  });

  std::vector<int16_t> buf(kChunkSamples);
  auto send_chunk = [&](size_t n_samples) {
    return ws_send(fd, 0x2, (const uint8_t*)buf.data(), n_samples * 2);
  };

  if (source == "--mic") {
    Alsa alsa;
    if (!alsa.init(device.c_str())) return 1;
    std::cerr << "listening on '" << device << "' — Ctrl-C to stop\n";
    while (!g_stop) {
      long got = alsa.read(buf.data(), kChunkSamples);
      if (got <= 0) break;
      if (!send_chunk((size_t)got)) break;
    }
  } else if (source == "--stdin") {
    while (!g_stop &&
           std::fread(buf.data(), 2, kChunkSamples, stdin) ==
               (size_t)kChunkSamples) {
      if (!send_chunk(kChunkSamples)) break;
    }
  } else {  // --file, real-time pace
    std::ifstream f(file, std::ios::binary);
    if (!f) {
      std::cerr << "cannot open " << file << "\n";
      return 1;
    }
    const auto tick = std::chrono::milliseconds(1000 * kChunkSamples / kFs);
    while (!g_stop &&
           f.read((char*)buf.data(), kChunkSamples * 2).gcount() > 0) {
      if (!send_chunk((size_t)(f.gcount() / 2))) break;
      std::this_thread::sleep_for(tick);
    }
  }

  const std::string fin = "{\"is_speaking\": false}";
  ws_send(fd, 0x1, (const uint8_t*)fin.data(), fin.size());
  for (int i = 0; i < 600 && !done; ++i)
    std::this_thread::sleep_for(std::chrono::milliseconds(100));
  rx.join();
  close(fd);
  return 0;
}
