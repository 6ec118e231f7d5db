// C++ websocket ASR client (websocket/bin/funasr-wss-client.cpp role).
//
// Dependency-free: raw POSIX sockets + a minimal RFC6455 implementation
// (HTTP upgrade, masked client frames, text/binary/close opcodes). Speaks
// the reference protocol: first JSON config message, binary s16le PCM
// chunks, {"is_speaking": false}, then prints results until is_final.
//
// Build: g++ -O2 -std=c++17 -o ws_client ws_client.cc
// Run:   ./ws_client <host> <port> <mode> <pcm-file>
#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <fstream>
#include <iostream>
#include <random>
#include <sstream>
#include <string>
#include <vector>

#include "ws_mini.h"

using namespace wsmini;


int main(int argc, char** argv) {
  if (argc < 5) {
    std::cerr << "usage: " << argv[0] << " <host> <port> <mode> <pcm>\n";
    return 1;
  }
  const std::string host = argv[1], port = argv[2], mode = argv[3];
  std::ifstream f(argv[4], std::ios::binary);
  std::vector<char> pcm((std::istreambuf_iterator<char>(f)),
                        std::istreambuf_iterator<char>());
  int fd = dial(host, port);
  if (fd < 0 || !ws_handshake(fd, host + ":" + port)) {
    std::cerr << "connect/handshake failed\n";
    return 1;
  }
  std::string first =
      "{\"mode\": \"" + mode + "\", \"chunk_size\": [5,10,5], "
      "\"chunk_interval\": 10, \"audio_fs\": 16000, "
      "\"wav_name\": \"cpp\", \"wav_format\": \"pcm\", "
      "\"is_speaking\": true, \"hotwords\": \"\", \"itn\": true}";
  ws_send(fd, 0x1, (const uint8_t*)first.data(), first.size());
  const size_t stride = 960 * 2 * 10;  // 600 ms of s16 PCM
  for (size_t off = 0; off < pcm.size(); off += stride) {
    const size_t n = std::min(stride, pcm.size() - off);
    ws_send(fd, 0x2, (const uint8_t*)pcm.data() + off, n);
  }
  const std::string done = "{\"is_speaking\": false}";
  ws_send(fd, 0x1, (const uint8_t*)done.data(), done.size());

  std::string offline, online, msg;
  uint8_t op;
  while (ws_recv(fd, &op, &msg)) {
    if (op != 0x1) continue;
    const std::string m = json_field(msg, "mode");
    const std::string text = json_field(msg, "text");
    if (m == "2pass-online" || m == "online") {
      online += text;
    } else {
      online.clear();
      offline += text;
    }
    std::cout << "\r" << offline << online << std::flush;
    if (msg.find("\"is_final\": true") != std::string::npos ||
        msg.find("\"is_final\":true") != std::string::npos) {
      std::cout << std::endl;
      break;
    }
  }
  close(fd);
  return 0;
}
