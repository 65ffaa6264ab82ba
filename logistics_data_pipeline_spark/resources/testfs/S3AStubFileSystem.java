package logisticsfs;

import java.io.IOException;
import java.net.URI;
import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;

/**
 * Test-only FileSystem: serves s3a://-shaped URIs from the local
 * filesystem so object-store code paths (scheme resolution, FS
 * caching, qualified paths, file listing) run without a real S3
 * endpoint or the hadoop-aws jar. The bucket authority rides in the
 * FS URI (Hadoop caches one FS instance per scheme+authority, exactly
 * as with real buckets); object keys map to local absolute paths.
 * Wire up with:
 *   spark.hadoop.fs.s3a.impl=logisticsfs.S3AStubFileSystem
 * NEVER use outside tests.
 */
public class S3AStubFileSystem extends RawLocalFileSystem {
    private URI uri = URI.create("s3a:///");

    @Override
    public void initialize(URI name, Configuration conf) throws IOException {
        String auth = name.getAuthority() == null ? "" : name.getAuthority();
        this.uri = URI.create(name.getScheme() + "://" + auth);
        super.initialize(name, conf);
    }

    @Override
    public URI getUri() {
        return uri != null ? uri : URI.create("s3a:///");
    }

    @Override
    public String getScheme() {
        return "s3a";
    }

    /**
     * RawLocalFileSystem's DeprecatedRawLocalFileStatus loads
     * permissions lazily via new File(path.toUri()), which rejects any
     * non-file scheme. Object stores have no POSIX permissions anyway,
     * so return plain eager FileStatus objects (default permissions) --
     * also closer to real S3A semantics.
     */
    private FileStatus sanitize(FileStatus s) {
        return new FileStatus(
                s.getLen(),
                s.isDirectory(),
                1,
                s.getBlockSize(),
                s.getModificationTime(),
                s.getPath());
    }

    @Override
    public FileStatus getFileStatus(Path f) throws IOException {
        return sanitize(super.getFileStatus(f));
    }

    @Override
    public FileStatus[] listStatus(Path f) throws IOException {
        FileStatus[] raw = super.listStatus(f);
        FileStatus[] out = new FileStatus[raw.length];
        for (int i = 0; i < raw.length; i++) {
            out[i] = sanitize(raw[i]);
        }
        return out;
    }
}
