/* Java websocket ASR client (clients/java/FunasrWsClient.java role).
 *
 * Speaks the reference protocol: first JSON config message, binary s16le
 * PCM frames, {"is_speaking": false} terminator; prints partial (2pass-
 * online) and final (2pass-offline) results.
 *
 * Build:  javac AsrWsClient.java   (uses only java.net.http, JDK 11+)
 * Run:    java AsrWsClient ws://localhost:10096 2pass audio.pcm
 */
import java.net.URI;
import java.net.http.HttpClient;
import java.net.http.WebSocket;
import java.nio.ByteBuffer;
import java.nio.charset.StandardCharsets;
import java.nio.file.Files;
import java.nio.file.Paths;
import java.util.concurrent.CompletableFuture;
import java.util.concurrent.CompletionStage;
import java.util.concurrent.CountDownLatch;

public class AsrWsClient {
    static final CountDownLatch done = new CountDownLatch(1);
    static final StringBuilder offline = new StringBuilder();
    static final StringBuilder online = new StringBuilder();

    public static void main(String[] args) throws Exception {
        if (args.length < 3) {
            System.err.println("usage: AsrWsClient <ws-url> <mode> <pcm>");
            System.exit(1);
        }
        String url = args[0];
        String mode = args[1];
        byte[] pcm = Files.readAllBytes(Paths.get(args[2]));

        WebSocket.Listener listener = new WebSocket.Listener() {
            final StringBuilder buf = new StringBuilder();

            @Override
            public CompletionStage<?> onText(WebSocket ws, CharSequence data,
                                             boolean last) {
                buf.append(data);
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
                    System.out.print("\r" + offline + online);
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

        WebSocket ws = HttpClient.newHttpClient().newWebSocketBuilder()
                .buildAsync(URI.create(url), listener).join();
        String first = String.format(
            "{\"mode\": \"%s\", \"chunk_size\": [5,10,5], " +
            "\"chunk_interval\": 10, \"audio_fs\": 16000, " +
            "\"wav_name\": \"java\", \"wav_format\": \"pcm\", " +
            "\"is_speaking\": true, \"hotwords\": \"\", \"itn\": true}",
            mode);
        ws.sendText(first, true).join();
        int stride = 960 * 2 * 10; // 600 ms of s16 PCM
        for (int off = 0; off < pcm.length; off += stride) {
            int n = Math.min(stride, pcm.length - off);
            ws.sendBinary(ByteBuffer.wrap(pcm, off, n), true).join();
        }
        ws.sendText("{\"is_speaking\": false}", true).join();
        done.await();
        ws.sendClose(WebSocket.NORMAL_CLOSURE, "bye").join();
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
