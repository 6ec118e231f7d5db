/* Java websocket ASR client — option parity with the reference's
 * clients/java/FunasrWsClient.java (--host/--port/--audio_in/--num_threads/
 * --chunk_size/--chunk_interval/--mode/--hotwords), JDK-only (no external
 * argparse/json/websocket deps; java.net.http, JDK 11+).
 *
 * Speaks the reference protocol: first JSON config message, binary s16le
 * PCM frames (wav files have their 44-byte RIFF header skipped), realtime
 * pacing for online/2pass modes, {"is_speaking": false} terminator;
 * prints partial (2pass-online, overwritten in place) and final
 * (2pass-offline / offline) results.
 *
 * Build:  javac AsrWsClient.java
 * Run:    java AsrWsClient --host 127.0.0.1 --port 10096 --mode 2pass \
 *             --audio_in audio.wav [--chunk_size "5,10,5"]
 *             [--chunk_interval 10] [--hotwords "阿里巴巴 20"]
 *             [--num_threads 4] [--itn true] [--ssl true]
 *         --audio_in also accepts a wav.scp ("id /path.wav" per line);
 *         --num_threads shards its lines across threads.
 */
import java.io.BufferedReader;
import java.io.FileReader;
import java.net.URI;
import java.net.http.HttpClient;
import java.net.http.WebSocket;
import java.nio.ByteBuffer;
import java.nio.file.Files;
import java.nio.file.Path;
import java.nio.file.Paths;
import java.security.cert.X509Certificate;
import java.util.ArrayList;
import java.util.HashMap;
import java.util.List;
import java.util.Map;
import java.util.concurrent.CompletionStage;
import java.util.concurrent.CountDownLatch;
import javax.net.ssl.SSLContext;
import javax.net.ssl.TrustManager;
import javax.net.ssl.X509TrustManager;

public class AsrWsClient {

    // ------------------------------------------------------------------
    // options (reference FunasrWsClient.java:240-330)
    // ------------------------------------------------------------------
    static String host = "127.0.0.1";
    static String port = "10095";
    static String audioIn = "asr_example.wav";
    static int numThreads = 1;
    static String chunkSize = "5, 10, 5";
    static int chunkInterval = 10;
    static String mode = "offline";
    static String hotwords = "";
    static boolean itn = true;
    static boolean ssl = false;

    public static void main(String[] args) throws Exception {
        Map<String, String> opts = parseArgs(args);
        host = opts.getOrDefault("host", host);
        port = opts.getOrDefault("port", port);
        audioIn = opts.getOrDefault("audio_in", audioIn);
        numThreads = Integer.parseInt(
            opts.getOrDefault("num_threads", "1"));
        chunkSize = opts.getOrDefault("chunk_size", chunkSize);
        chunkInterval = Integer.parseInt(
            opts.getOrDefault("chunk_interval", "10"));
        mode = opts.getOrDefault("mode", mode);
        hotwords = opts.getOrDefault("hotwords", hotwords);
        itn = !"false".equalsIgnoreCase(opts.getOrDefault("itn", "true"));
        ssl = "true".equalsIgnoreCase(opts.getOrDefault("ssl", "false"));
        // hotwords may name a file of "word weight" lines (server format)
        if (!hotwords.isEmpty() && Files.exists(Paths.get(hotwords))) {
            hotwords = String.join(" ",
                Files.readAllLines(Paths.get(hotwords)));
        }

        List<String[]> jobs = new ArrayList<>();   // {wav_name, path}
        if (audioIn.endsWith(".scp")) {
            try (BufferedReader r = new BufferedReader(
                     new FileReader(audioIn))) {
                String line;
                while ((line = r.readLine()) != null) {
                    String[] parts = line.trim().split("\\s+", 2);
                    if (parts.length == 2) jobs.add(parts);
                }
            }
        } else {
            Path p = Paths.get(audioIn);
            jobs.add(new String[]{p.getFileName().toString(), audioIn});
        }

        List<Thread> threads = new ArrayList<>();
        for (int t = 0; t < numThreads; t++) {
            final int shard = t;
            Thread th = new Thread(() -> {
                for (int i = shard; i < jobs.size(); i += numThreads) {
                    String[] job = jobs.get(i);
                    try {
                        runOne(job[0], job[1]);
                    } catch (Exception e) {
                        System.err.println(job[0] + ": " + e);
                    }
                }
            });
            th.start();
            threads.add(th);
        }
        for (Thread th : threads) th.join();
    }

    static void runOne(String wavName, String path) throws Exception {
        byte[] data = Files.readAllBytes(Paths.get(path));
        String fmt = "pcm";
        if (path.toLowerCase().endsWith(".wav") && data.length > 44) {
            // RIFF header: skip to the PCM payload (reference skips 44)
            byte[] pcm = new byte[data.length - 44];
            System.arraycopy(data, 44, pcm, 0, pcm.length);
            data = pcm;
        }
        final byte[] pcm = data;

        CountDownLatch done = new CountDownLatch(1);
        StringBuilder offline = new StringBuilder();
        StringBuilder online = new StringBuilder();

        WebSocket.Listener listener = new WebSocket.Listener() {
            final StringBuilder buf = new StringBuilder();

            @Override
            public CompletionStage<?> onText(WebSocket ws,
                                             CharSequence d, boolean last) {
                buf.append(d);
                if (last) {
                    String msg = buf.toString();
                    buf.setLength(0);
                    String text = jsonField(msg, "text");
                    String m = jsonField(msg, "mode");
                    if ("2pass-online".equals(m) || "online".equals(m)) {
                        online.append(text);
                    } else if (text != null) {
                        online.setLength(0);
                        offline.append(text);
                    }
                    System.out.print("\r[" + wavName + "] "
                                     + offline + online);
                    if (msg.contains("\"is_final\": true")
                            || msg.contains("\"is_final\":true")) {
                        System.out.println();
                        done.countDown();
                    }
                }
                ws.request(1);
                return null;
            }
        };

        HttpClient.Builder hb = HttpClient.newBuilder();
        String scheme = "ws";
        if (ssl) {
            scheme = "wss";
            SSLContext sc = SSLContext.getInstance("TLS");
            sc.init(null, new TrustManager[]{new X509TrustManager() {
                public void checkClientTrusted(X509Certificate[] c,
                                               String a) {}
                public void checkServerTrusted(X509Certificate[] c,
                                               String a) {}
                public X509Certificate[] getAcceptedIssuers() {
                    return new X509Certificate[0];
                }
            }}, null);   // self-signed server certs (reference ssl_key/)
            hb.sslContext(sc);
        }
        String url = scheme + "://" + host + ":" + port;
        WebSocket ws = hb.build().newWebSocketBuilder()
                .buildAsync(URI.create(url), listener).join();

        StringBuilder first = new StringBuilder();
        first.append("{\"mode\": \"").append(mode).append("\"");
        first.append(", \"chunk_size\": [");
        String[] cs = chunkSize.split(",");
        for (int i = 0; i < cs.length; i++) {
            if (i > 0) first.append(",");
            first.append(cs[i].trim());
        }
        first.append("], \"chunk_interval\": ").append(chunkInterval);
        first.append(", \"audio_fs\": 16000");
        first.append(", \"wav_name\": \"").append(wavName).append("\"");
        first.append(", \"wav_format\": \"pcm\"");
        first.append(", \"is_speaking\": true");
        first.append(", \"itn\": ").append(itn);
        if (!hotwords.isEmpty()) {
            first.append(", \"hotwords\": \"")
                 .append(hotwords.replace("\"", "\\\"")).append("\"");
        }
        first.append("}");
        ws.sendText(first.toString(), true).join();

        // stride = 60 * chunk_size[1] / chunk_interval ms of s16 PCM
        int center = Integer.parseInt(cs[1].trim());
        int strideMs = 60 * center / chunkInterval;
        int stride = strideMs * 16 * 2;
        for (int off = 0; off < pcm.length; off += stride) {
            int n = Math.min(stride, pcm.length - off);
            ws.sendBinary(ByteBuffer.wrap(pcm, off, n), true).join();
            if (!mode.equals("offline")) {
                Thread.sleep(strideMs);   // realtime pacing
            }
        }
        ws.sendText("{\"is_speaking\": false}", true).join();
        done.await();
        ws.sendClose(WebSocket.NORMAL_CLOSURE, "bye").join();
    }

    static Map<String, String> parseArgs(String[] args) {
        Map<String, String> m = new HashMap<>();
        for (int i = 0; i < args.length; i++) {
            if (args[i].startsWith("--")) {
                String key = args[i].substring(2);
                if (i + 1 < args.length && !args[i + 1].startsWith("--")) {
                    m.put(key, args[++i]);
                } else {
                    m.put(key, "true");
                }
            }
        }
        return m;
    }

    /** Minimal JSON string-field extractor (no external deps). */
    static String jsonField(String json, String key) {
        String pat = "\"" + key + "\"";
        int i = json.indexOf(pat);
        if (i < 0) return null;
        i = json.indexOf(':', i + pat.length());
        if (i < 0) return null;
        i++;
        while (i < json.length() && Character.isWhitespace(json.charAt(i))) i++;
        if (i >= json.length() || json.charAt(i) != '"') return null;
        StringBuilder sb = new StringBuilder();
        for (int j = i + 1; j < json.length(); j++) {
            char c = json.charAt(j);
            if (c == '\\' && j + 1 < json.length()) {
                sb.append(json.charAt(++j));
            } else if (c == '"') {
                return sb.toString();
            } else {
                sb.append(c);
            }
        }
        return null;
    }
}
